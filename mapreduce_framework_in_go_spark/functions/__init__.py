from .text import TOKEN_SPLIT_RE, md5_long32, tokens_col
from .vectors import cosine_sim, dot, l2_norm

__all__ = ["TOKEN_SPLIT_RE", "tokens_col", "md5_long32", "cosine_sim", "dot", "l2_norm"]
