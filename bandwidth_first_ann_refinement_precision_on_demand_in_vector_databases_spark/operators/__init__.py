from .topk import score_crossjoin, topk_per_query, exact_topk, exact_topk_fast  # noqa: F401
from .metrics import recall_at_k  # noqa: F401
