from .modules import (
    MODEL_REGISTRY, make_model,
    SAGE, SAGEClassic, SAGEResInception, GAT, GIN, JKNet, GCN, ARMA,
)

__all__ = [
    "MODEL_REGISTRY", "make_model",
    "SAGE", "SAGEClassic", "SAGEResInception", "GAT", "GIN", "JKNet",
    "GCN", "ARMA",
]
