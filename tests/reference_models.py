"""Instantiate the reference torch modules on CPU (stubbing detectron2 / timm /
fvcore / the CUDA extension) to obtain their true state-dict names and shapes.
Used as a golden oracle for the checkpoint converter — no reference code is
copied into the framework."""

from __future__ import annotations

import importlib.util
import sys
import types

REF_ROOT = "/root/reference"


def _install_stubs():
    import torch
    import torch.nn as nn

    # ---- detectron2 ----
    d2 = types.ModuleType("detectron2")

    class Registry:
        def __init__(self, name=""):
            self._map = {}

        def register(self, obj=None):
            if obj is None:
                return lambda o: self.register(o)
            self._map[obj.__name__] = obj
            return obj

        def get(self, name):
            return self._map[name]

    def configurable(init_func=None, *, from_config=None):
        # identity: callers in tests construct modules with explicit kwargs
        if init_func is not None:
            return init_func
        return lambda f: f

    class ShapeSpec:
        def __init__(self, channels=None, stride=None, height=None, width=None):
            self.channels = channels
            self.stride = stride
            self.height = height
            self.width = width

    class Backbone(nn.Module):
        def output_shape(self):
            return {}

        @property
        def size_divisibility(self):
            return 0

    mod_config = types.ModuleType("detectron2.config")
    mod_config.configurable = configurable

    class CfgNode(dict):
        pass

    mod_config.CfgNode = CfgNode

    mod_layers = types.ModuleType("detectron2.layers")
    mod_layers.ShapeSpec = ShapeSpec
    mod_layers.Conv2d = nn.Conv2d

    def get_norm(norm, out_channels):
        return nn.GroupNorm(32, out_channels)

    mod_layers.get_norm = get_norm

    mod_modeling = types.ModuleType("detectron2.modeling")
    mod_modeling.BACKBONE_REGISTRY = Registry("backbone")
    mod_modeling.SEM_SEG_HEADS_REGISTRY = Registry("sem_seg_heads")
    mod_modeling.META_ARCH_REGISTRY = Registry("meta_arch")
    mod_modeling.Backbone = Backbone
    mod_modeling.ShapeSpec = ShapeSpec
    mod_modeling.build_backbone = lambda cfg: None
    mod_modeling.build_sem_seg_head = lambda cfg, shp: None

    mod_utils = types.ModuleType("detectron2.utils")
    mod_registry = types.ModuleType("detectron2.utils.registry")
    mod_registry.Registry = Registry
    mod_utils.registry = mod_registry

    d2.config = mod_config
    d2.layers = mod_layers
    d2.modeling = mod_modeling
    d2.utils = mod_utils
    sys.modules.setdefault("detectron2", d2)
    sys.modules.setdefault("detectron2.config", mod_config)
    sys.modules.setdefault("detectron2.layers", mod_layers)
    sys.modules.setdefault("detectron2.modeling", mod_modeling)
    sys.modules.setdefault("detectron2.utils", mod_utils)
    sys.modules.setdefault("detectron2.utils.registry", mod_registry)

    # ---- timm ----
    timm = types.ModuleType("timm")
    timm_models = types.ModuleType("timm.models")
    timm_layers = types.ModuleType("timm.models.layers")

    class DropPath(nn.Module):
        def __init__(self, p=0.0):
            super().__init__()

        def forward(self, x):
            return x

    def trunc_normal_(t, std=1.0):
        with torch.no_grad():
            t.normal_(0, std)
        return t

    timm_layers.DropPath = DropPath
    timm_layers.trunc_normal_ = trunc_normal_
    timm.models = timm_models
    timm_models.layers = timm_layers
    sys.modules.setdefault("timm", timm)
    sys.modules.setdefault("timm.models", timm_models)
    sys.modules.setdefault("timm.models.layers", timm_layers)

    # ---- fvcore ----
    fv = types.ModuleType("fvcore")
    fv_nn = types.ModuleType("fvcore.nn")
    fv_wi = types.ModuleType("fvcore.nn.weight_init")
    fv_wi.c2_xavier_fill = lambda m: None
    fv_wi.c2_msra_fill = lambda m: None
    fv_nn.weight_init = fv_wi
    fv.nn = fv_nn
    sys.modules.setdefault("fvcore", fv)
    sys.modules.setdefault("fvcore.nn", fv_nn)
    sys.modules.setdefault("fvcore.nn.weight_init", fv_wi)

    # ---- pykeops (exact brute-force KNN stand-in) ----
    if "pykeops" not in sys.modules:
        pk = types.ModuleType("pykeops")
        pk_torch = types.ModuleType("pykeops.torch")

        class LazyTensor:
            """Eager stand-in for the LazyTensor ops knn_keops uses
            (point_utils.py:51-59): sub, **, sum, argKmin, Kmin_argKmin."""

            def __init__(self, t):
                self.t = t

            def __sub__(self, other):
                return LazyTensor(self.t - other.t)

            def __pow__(self, p):
                return LazyTensor(self.t ** p)

            def sum(self, dim):
                return LazyTensor(self.t.sum(dim))

            # Tie-break note: distance ties are real on symmetric grids; the
            # smallest-k must take the LOWEST index first (stable ascending
            # sort) to match jax.lax.top_k's guaranteed tie semantics.
            # torch.topk's tie order is implementation-defined, so use a
            # stable argsort instead — an equally valid exact-KNN result.
            def argKmin(self, k, dim):
                # self.t: (b, n_db, n_q); smallest-k over the db dim
                idx = self.t.argsort(dim=dim, stable=True).narrow(dim, 0, k)
                if dim == 1:
                    return idx.permute(0, 2, 1).contiguous()
                return idx

            def Kmin_argKmin(self, k, dim):
                idx = self.t.argsort(dim=dim, stable=True).narrow(dim, 0, k)
                vals = self.t.gather(dim, idx)
                if dim == 1:
                    return (
                        vals.permute(0, 2, 1).contiguous(),
                        idx.permute(0, 2, 1).contiguous(),
                    )
                return vals, idx

        pk_torch.LazyTensor = LazyTensor
        pk.torch = pk_torch
        sys.modules["pykeops"] = pk
        sys.modules["pykeops.torch"] = pk_torch

    # ---- the CUDA extension package: pure-torch stand-ins ----
    # Formulas are the reference's own parity oracles
    # (clusten/test_wg_kernel.py:37-38, test_msdetrpc_kernel.py:44-45) and
    # the kernel accessor layouts (clustenwf_cuda_kernel.cu:20-48 etc.).
    clusten = types.ModuleType("refmask.modeling.clusten")

    class CLUSTENQKFunction:
        @staticmethod
        def apply(query, key, nbhd_idx):
            # query/key: (b, h, n, c_); nbhd_idx: (b, n, m)
            b, h, n, c_ = query.shape
            m = nbhd_idx.shape[-1]
            idx = nbhd_idx[:, None].expand(-1, h, -1, -1).reshape(b, h, n * m)
            k_g = key.gather(
                index=idx[..., None].expand(-1, -1, -1, c_), dim=2
            ).reshape(b, h, n, m, c_)
            return (query[:, :, :, None, :] * k_g).sum(-1)

    class CLUSTENAVFunction:
        @staticmethod
        def apply(attn, v, nbhd_idx):
            # attn: (b, h, n, m); v: (b, h, n, c_); nbhd_idx: (b, n, m)
            b, h, n, m = attn.shape
            c_ = v.shape[-1]
            idx = nbhd_idx[:, None].expand(-1, h, -1, -1).reshape(b, h, n * m)
            v_g = v.gather(
                index=idx[..., None].expand(-1, -1, -1, c_), dim=2
            ).reshape(b, h, n, m, c_)
            return (attn[..., None] * v_g).sum(3)

    class CLUSTENWFFunction:
        @staticmethod
        def apply(weights, feat, nbhd_idx):
            # weights: (b, n, m, ic); feat: (b, N, c); nbhd_idx: (b, n, m)
            b, n, m, ic = weights.shape
            c = feat.shape[-1]
            f_g = feat.gather(
                index=nbhd_idx.reshape(b, n * m, 1).expand(-1, -1, c), dim=1
            ).reshape(b, n, m, c)
            # output layout (b, n, ic, c) per clustenwf_cuda_kernel.cu:23
            return (weights[..., None] * f_g[:, :, :, None, :]).sum(2)

    class WEIGHTEDGATHERFunction:
        @staticmethod
        def apply(nbhd_idx, weights, feat):
            # nbhd_idx/weights: (b, n, k); feat: (b, N, c)
            b, n, k = nbhd_idx.shape
            c = feat.shape[-1]
            f_g = feat.gather(
                index=nbhd_idx.reshape(b, n * k, 1).expand(-1, -1, c), dim=1
            ).reshape(b, n, k, c)
            return (f_g * weights[..., None]).sum(2)

    class MSDETRPCFunction:
        @staticmethod
        def apply(nn_idx, nn_weight, attn, val):
            # nn_idx/nn_weight: (b, n, m, k); attn: (b, n, m); val: (b, N, c)
            b, n, m, k = nn_idx.shape
            c = val.shape[-1]
            v_g = val.gather(
                index=nn_idx.reshape(b, n * m * k, 1).expand(-1, -1, c), dim=1
            ).reshape(b, n, m, k, c)
            return ((v_g * nn_weight[..., None]).sum(3) * attn[..., None]).sum(2)

    for name, fn in [
        ("CLUSTENQKFunction", CLUSTENQKFunction),
        ("CLUSTENAVFunction", CLUSTENAVFunction),
        ("CLUSTENWFFunction", CLUSTENWFFunction),
        ("WEIGHTEDGATHERFunction", WEIGHTEDGATHERFunction),
        ("MSDETRPCFunction", MSDETRPCFunction),
    ]:
        setattr(clusten, name, fn)
    return clusten


def _install_loss_stubs():
    """Stubs + real torch implementations needed by the reference
    criterion.py / matcher.py: detectron2.utils.comm, point_rend's
    point_features (actual grid_sample-based code), and utils.misc."""
    import torch
    import torch.nn.functional as F

    comm = types.ModuleType("detectron2.utils.comm")
    comm.get_world_size = lambda: 1
    sys.modules.setdefault("detectron2.utils.comm", comm)
    if "detectron2.utils" in sys.modules:
        sys.modules["detectron2.utils"].comm = comm

    pr = types.ModuleType("detectron2.projects")
    prr = types.ModuleType("detectron2.projects.point_rend")
    pf = types.ModuleType("detectron2.projects.point_rend.point_features")

    def point_sample(input, point_coords, **kwargs):
        add_dim = False
        if point_coords.dim() == 3:
            add_dim = True
            point_coords = point_coords.unsqueeze(2)
        output = F.grid_sample(input, 2.0 * point_coords - 1.0, **kwargs)
        if add_dim:
            output = output.squeeze(3)
        return output

    def get_uncertain_point_coords_with_randomness(
        coarse_logits, uncertainty_func, num_points, oversample_ratio,
        importance_sample_ratio,
    ):
        num_boxes = coarse_logits.shape[0]
        num_sampled = int(num_points * oversample_ratio)
        point_coords = torch.rand(num_boxes, num_sampled, 2)
        point_logits = point_sample(coarse_logits, point_coords, align_corners=False)
        point_uncertainties = uncertainty_func(point_logits)
        num_uncertain = int(importance_sample_ratio * num_points)
        num_random = num_points - num_uncertain
        idx = torch.topk(point_uncertainties[:, 0, :], k=num_uncertain, dim=1)[1]
        shift = num_sampled * torch.arange(num_boxes, dtype=torch.long)
        idx = idx + shift[:, None]
        point_coords = point_coords.view(-1, 2)[idx.view(-1), :].view(
            num_boxes, num_uncertain, 2
        )
        if num_random > 0:
            point_coords = torch.cat(
                [point_coords, torch.rand(num_boxes, num_random, 2)], dim=1
            )
        return point_coords

    pf.point_sample = point_sample
    pf.get_uncertain_point_coords_with_randomness = (
        get_uncertain_point_coords_with_randomness
    )
    prr.point_features = pf
    pr.point_rend = prr
    sys.modules.setdefault("detectron2.projects", pr)
    sys.modules.setdefault("detectron2.projects.point_rend", prr)
    sys.modules.setdefault("detectron2.projects.point_rend.point_features", pf)

    misc = types.ModuleType("refmask.utils.misc")
    misc.is_dist_avail_and_initialized = lambda: False

    class _NT:
        def __init__(self, t, m):
            self.tensors, self.mask = t, m

        def decompose(self):
            return self.tensors, self.mask

    def nested_tensor_from_tensor_list(tensor_list):
        t = torch.stack(list(tensor_list))
        m = torch.zeros((t.shape[0],) + tuple(t.shape[2:]), dtype=torch.bool)
        return _NT(t, m)

    misc.nested_tensor_from_tensor_list = nested_tensor_from_tensor_list
    utils_pkg = types.ModuleType("refmask.utils")
    utils_pkg.__path__ = []
    sys.modules.setdefault("refmask.utils", utils_pkg)
    sys.modules["refmask.utils.misc"] = misc


def load_reference_losses():
    """Load the real reference criterion.py + matcher.py on CPU."""
    _install_stubs()
    _install_loss_stubs()
    for name in ["refmask", "refmask.modeling"]:
        if name not in sys.modules:
            m = types.ModuleType(name)
            m.__path__ = []
            sys.modules[name] = m
    matcher = _load(
        "mask2former/modeling/matcher.py",
        "refmask.modeling.matcher",
        "refmask.modeling",
    )
    criterion = _load(
        "mask2former/modeling/criterion.py",
        "refmask.modeling.criterion",
        "refmask.modeling",
    )
    matcher_ds = _load(
        "mask2former/modeling/matcher_downsampled.py",
        "refmask.modeling.matcher_downsampled",
        "refmask.modeling",
    )
    criterion_ds = _load(
        "mask2former/modeling/criterion_downsampled.py",
        "refmask.modeling.criterion_downsampled",
        "refmask.modeling",
    )
    return {
        "matcher": matcher,
        "criterion": criterion,
        "matcher_downsampled": matcher_ds,
        "criterion_downsampled": criterion_ds,
    }


def force_stable_sort():
    """Make torch.Tensor.sort stable process-wide.

    The reference's SFC clustering sorts float32 keys with exact ties
    (point_utils.py:240-241); torch's default unstable sort breaks those ties
    in an implementation-defined mixed order that nothing can replicate.  Any
    tie order is equally valid reference behavior — parity tests pin the
    stable one, which jnp.argsort(stable=True) reproduces bit-exactly."""
    import torch

    if getattr(torch.Tensor.sort, "_is_stable_patch", False):
        return
    orig = torch.Tensor.sort

    def stable_sort(self, dim=-1, descending=False, stable=False):
        return orig(self, dim=dim, descending=descending, stable=True)

    stable_sort._is_stable_patch = True
    torch.Tensor.sort = stable_sort


def _load(relpath, modname, package, clusten_mod=None):
    spec = importlib.util.spec_from_file_location(
        modname, f"{REF_ROOT}/{relpath}", submodule_search_locations=[]
    )
    mod = importlib.util.module_from_spec(spec)
    mod.__package__ = package
    sys.modules[modname] = mod
    spec.loader.exec_module(mod)
    return mod


def load_reference_modules():
    """Returns dict with the reference aff / pixel-decoder / decoder modules."""
    clusten = _install_stubs()

    pkg_names = [
        "refmask",
        "refmask.modeling",
        "refmask.modeling.backbone",
        "refmask.modeling.pixel_decoder",
        "refmask.modeling.transformer_decoder",
    ]
    for name in pkg_names:
        if name not in sys.modules:
            m = types.ModuleType(name)
            m.__path__ = []
            sys.modules[name] = m
    sys.modules["refmask.modeling.clusten"] = clusten

    pu = _load(
        "mask2former/modeling/backbone/point_utils.py",
        "refmask.modeling.backbone.point_utils",
        "refmask.modeling.backbone",
    )
    aff = _load(
        "mask2former/modeling/backbone/aff.py",
        "refmask.modeling.backbone.aff",
        "refmask.modeling.backbone",
    )
    pe = _load(
        "mask2former/modeling/transformer_decoder/position_encoding.py",
        "refmask.modeling.transformer_decoder.position_encoding",
        "refmask.modeling.transformer_decoder",
    )
    tr = _load(
        "mask2former/modeling/transformer_decoder/transformer.py",
        "refmask.modeling.transformer_decoder.transformer",
        "refmask.modeling.transformer_decoder",
    )
    build = types.ModuleType("refmask.modeling.transformer_decoder.build")

    class _Reg:
        def register(self, obj=None):
            if obj is None:
                return lambda o: o
            return obj

    build.TRANSFORMER_DECODER_REGISTRY = _Reg()
    sys.modules["refmask.modeling.transformer_decoder.build"] = build

    dec = _load(
        "mask2former/modeling/transformer_decoder/mask2former_transformer_decoder.py",
        "refmask.modeling.transformer_decoder.mask2former_transformer_decoder",
        "refmask.modeling.transformer_decoder",
    )
    pixdec = _load(
        "mask2former/modeling/pixel_decoder/msdeformattn_pc.py",
        "refmask.modeling.pixel_decoder.msdeformattn_pc",
        "refmask.modeling.pixel_decoder",
    )
    return {"aff": aff, "decoder": dec, "pixel_decoder": pixdec, "point_utils": pu}


def _install_meta_arch_stubs():
    """Stubs needed by the reference MaskFormer meta-arch
    (maskformer_model.py): ImageList/Instances/Boxes, the real
    sem_seg_postprocess semantics, MetadataCatalog, retry_if_cuda_oom."""
    import torch
    import torch.nn.functional as F

    class ImageList:
        """detectron2 ImageList semantics: pad each image bottom/right with
        ZEROS to the common max size rounded up to size_divisibility."""

        def __init__(self, tensor, image_sizes):
            self.tensor = tensor
            self.image_sizes = image_sizes

        def __len__(self):
            return len(self.image_sizes)

        @staticmethod
        def from_tensors(tensors, size_divisibility=0, pad_value=0.0):
            image_sizes = [(t.shape[-2], t.shape[-1]) for t in tensors]
            max_h = max(s[0] for s in image_sizes)
            max_w = max(s[1] for s in image_sizes)
            if size_divisibility > 1:
                d = size_divisibility
                max_h = -(-max_h // d) * d
                max_w = -(-max_w // d) * d
            batched = tensors[0].new_full(
                (len(tensors), tensors[0].shape[0], max_h, max_w), pad_value
            )
            for i, t in enumerate(tensors):
                batched[i, :, : t.shape[-2], : t.shape[-1]].copy_(t)
            return ImageList(batched.contiguous(), image_sizes)

    class Instances:
        def __init__(self, image_size, **kwargs):
            self._image_size = image_size
            self._fields = {}
            for k, v in kwargs.items():
                setattr(self, k, v)

        @property
        def image_size(self):
            return self._image_size

        def __setattr__(self, name, val):
            if name.startswith("_"):
                super().__setattr__(name, val)
            else:
                self._fields[name] = val

        def __getattr__(self, name):
            if name.startswith("_") or name not in self.__dict__.get("_fields", {}):
                raise AttributeError(name)
            return self._fields[name]

        def __len__(self):
            for v in self._fields.values():
                return len(v)
            return 0

    class Boxes:
        def __init__(self, tensor):
            self.tensor = tensor

    def sem_seg_postprocess(result, img_size, output_height, output_width):
        """Real detectron2 semantics (modeling/postprocessing.py): crop the
        padded prediction to the image region, then bilinear-resize
        (align_corners=False) to the output size."""
        result = result[:, : img_size[0], : img_size[1]].expand(1, -1, -1, -1)
        result = F.interpolate(
            result, size=(output_height, output_width), mode="bilinear",
            align_corners=False,
        )[0]
        return result

    structures = sys.modules.get("detectron2.structures")
    if structures is None:
        structures = types.ModuleType("detectron2.structures")
        sys.modules["detectron2.structures"] = structures
    structures.ImageList = ImageList
    structures.Instances = Instances
    structures.Boxes = Boxes

    post = types.ModuleType("detectron2.modeling.postprocessing")
    post.sem_seg_postprocess = sem_seg_postprocess
    sys.modules["detectron2.modeling.postprocessing"] = post
    bb_mod = types.ModuleType("detectron2.modeling.backbone")
    if "detectron2.modeling" in sys.modules:
        mod_modeling = sys.modules["detectron2.modeling"]
        mod_modeling.postprocessing = post
        bb_mod.Backbone = mod_modeling.Backbone
        mod_modeling.backbone = bb_mod
    sys.modules["detectron2.modeling.backbone"] = bb_mod

    data_mod = sys.modules.get("detectron2.data")
    if data_mod is None:
        data_mod = types.ModuleType("detectron2.data")
        sys.modules["detectron2.data"] = data_mod

    class _MetaNS:
        def __getattr__(self, name):
            raise AttributeError(name)

    class _MetadataCatalog:
        @staticmethod
        def get(name):
            return _MetaNS()

    data_mod.MetadataCatalog = _MetadataCatalog

    memory = types.ModuleType("detectron2.utils.memory")
    memory.retry_if_cuda_oom = lambda fn: fn
    sys.modules["detectron2.utils.memory"] = memory
    if "detectron2.utils" in sys.modules:
        sys.modules["detectron2.utils"].memory = memory


def load_reference_meta_arch():
    """Load the real reference MaskFormer meta-arch (maskformer_model.py) on
    CPU.  Returns the module; construct MaskFormer with explicit kwargs (the
    configurable stub is identity)."""
    load_reference_losses()          # installs stubs + refmask.modeling.*
    _install_meta_arch_stubs()
    return _load(
        "mask2former/maskformer_model.py",
        "refmask.maskformer_model",
        "refmask",
    )
