from .attention import AttentionLayer, full_attention, prob_sparse_attention
from .embed import DataEmbedding, TokenEmbedding, sinusoid_position_encoding
from .informer import Informer, InformerStack, build_informer

__all__ = [
    "AttentionLayer",
    "full_attention",
    "prob_sparse_attention",
    "DataEmbedding",
    "TokenEmbedding",
    "sinusoid_position_encoding",
    "Informer",
    "InformerStack",
    "build_informer",
]
