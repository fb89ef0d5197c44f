from tggcn.models.registry import select_model
from tggcn.models.tggcn import TGGCNConfig, apply_tggcn, init_tggcn
