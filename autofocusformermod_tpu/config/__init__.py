from .cfg_node import CfgNode
from .defaults import get_cfg, add_maskformer2_config, add_deeplab_config

__all__ = ["CfgNode", "get_cfg", "add_maskformer2_config", "add_deeplab_config"]
