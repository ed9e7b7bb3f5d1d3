"""Load the reference's pure-torch geometry module (point_utils.py) on CPU for
behavioral parity testing, stubbing out its CUDA-extension import.

This does not copy reference code into the framework — it imports the
read-only reference at test time as a golden oracle.
"""

import importlib.util
import sys
import types

REF = "/root/reference/mask2former/modeling/backbone/point_utils.py"


def load_reference_point_utils():
    import torch  # noqa: F401

    # Stub the package chain so `from ..clusten import WEIGHTEDGATHERFunction`
    # resolves without the CUDA extension.
    pkg_root = types.ModuleType("refm")
    pkg_modeling = types.ModuleType("refm.modeling")
    pkg_backbone = types.ModuleType("refm.modeling.backbone")
    pkg_clusten = types.ModuleType("refm.modeling.clusten")
    pkg_root.modeling = pkg_modeling
    pkg_modeling.backbone = pkg_backbone
    pkg_modeling.clusten = pkg_clusten

    class _Unavailable:
        @staticmethod
        def apply(*a, **k):
            raise RuntimeError("CUDA kernel not available in CPU golden test")

    pkg_clusten.WEIGHTEDGATHERFunction = _Unavailable

    sys.modules.setdefault("refm", pkg_root)
    sys.modules.setdefault("refm.modeling", pkg_modeling)
    sys.modules.setdefault("refm.modeling.backbone", pkg_backbone)
    sys.modules["refm.modeling.clusten"] = pkg_clusten

    spec = importlib.util.spec_from_file_location(
        "refm.modeling.backbone.point_utils", REF,
        submodule_search_locations=[],
    )
    mod = importlib.util.module_from_spec(spec)
    mod.__package__ = "refm.modeling.backbone"
    sys.modules["refm.modeling.backbone.point_utils"] = mod
    spec.loader.exec_module(mod)
    return mod
