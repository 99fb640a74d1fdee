from .vector import dot, l2_norm, unit, cosine, dist2, delta_from_exp_col  # noqa: F401
