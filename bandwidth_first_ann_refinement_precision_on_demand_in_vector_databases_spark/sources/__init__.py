from .fixtures import FIXTURE_TABLES, load_table, register_views, queries_view  # noqa: F401
from .loaders import load_vec, load_fvecs, load_bin_header_body, load_matrix, synthetic_corpus  # noqa: F401
