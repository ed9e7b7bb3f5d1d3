"""Numerical parity against the REAL reference modules run on CPU.

The reference torch modules (aff.py, msdeformattn_pc.py,
mask2former_transformer_decoder.py) are imported from /root/reference with
pure-torch stand-ins for the 5 CLUSTEN CUDA kernels (formulas from the
reference's own clusten/test_*_kernel.py oracles).  Their state dicts are
converted with engine/convert_checkpoint.py and must produce matching
activations in this framework — this certifies both the module rebuilds and
the checkpoint converter (VERDICT r1 item 2: the north star is eval parity
with published checkpoints; this is the converted-random-weights tier).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
import jax.numpy as jnp  # noqa: E402

from flax import traverse_util  # noqa: E402

from autofocusformermod_tpu.engine.convert_checkpoint import (  # noqa: E402
    convert_reference_state_dict,
)
from tests.reference_models import (  # noqa: E402
    force_stable_sort,
    load_reference_modules,
)

EMBED = [16, 24, 32, 40]
DEPTHS = [1, 1, 1, 1]
HEADS = [2, 2, 2, 2]
NBHD = [48, 48, 48, 48]


def _ref_modules():
    mods = load_reference_modules()
    force_stable_sort()
    return mods


def _torch_state_to_tree(ref_model, subtree):
    """Convert a reference module's state dict (prefixed as the meta-arch
    would name it) into flat param/stat dicts under `subtree`."""
    sd = {
        f"{subtree}.{k}": v.detach().numpy()
        for k, v in ref_model.state_dict().items()
    }
    return convert_reference_state_dict(sd)


def _strip(flat, head):
    return {k[1:]: v for k, v in flat.items() if k[0] == head}


def _sorted_by_pos(pos, feat):
    """Sort rows lexicographically by (y, x) so both frameworks' token
    orders become comparable."""
    key = pos[:, 1] * 100000 + pos[:, 0]
    order = np.argsort(key, kind="stable")
    return pos[order], feat[order]


@pytest.fixture(scope="module")
def aff_pair():
    mods = _ref_modules()
    torch.manual_seed(0)
    ref = mods["aff"].AFF(
        embed_dim=EMBED, depths=DEPTHS, num_heads=HEADS, nbhd_size=NBHD,
        mlp_ratio=2.0, drop_path_rate=0.0, drop_rate=0.0, attn_drop_rate=0.0,
    )
    ref.eval()

    from autofocusformermod_tpu.models.aff import AFF

    mine = AFF(
        embed_dim=tuple(EMBED), depths=tuple(DEPTHS), num_heads=tuple(HEADS),
        nbhd_size=tuple(NBHD), mlp_ratio=2.0, drop_path_rate=0.0,
        use_pallas=False,
    )
    # 128x128 so every stage that downsamples has n > nbhd (1024/256/64
    # tokens; only the final no-downsample stage goes global-attention).
    # Smaller inputs hit global-attn+downsample, which the reference itself
    # cannot run (ClusterMerging needs member_idx, None under global attn).
    x = np.random.default_rng(0).uniform(-1, 1, (1, 128, 128, 3)).astype(np.float32)
    # XLA CPU convs/matmuls default to a low-precision pass (~2e-3 error vs
    # torch); parity comparisons need true fp32
    with jax.default_matmul_precision("highest"):
        variables = mine.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)

    flat_p, flat_s = _torch_state_to_tree(ref, "backbone")
    params = traverse_util.flatten_dict(variables["params"])
    n_hit = 0
    for k in list(params.keys()):
        src = ("backbone",) + k
        if src in flat_p:
            assert params[k].shape == flat_p[src].shape, (k, params[k].shape,
                                                          flat_p[src].shape)
            params[k] = jnp.asarray(flat_p[src])
            n_hit += 1
    assert n_hit >= len(params) - 2, (
        f"converter covered only {n_hit}/{len(params)} AFF tensors"
    )
    stats = traverse_util.flatten_dict(variables["batch_stats"])
    for k in list(stats.keys()):
        src = ("backbone",) + k
        if src in flat_s:
            stats[k] = jnp.asarray(flat_s[src])
    variables = {
        "params": traverse_util.unflatten_dict(params),
        "batch_stats": traverse_util.unflatten_dict(stats),
    }
    return ref, mine, variables, x


def test_aff_stage_parity(aff_pair):
    ref, mine, variables, x = aff_pair
    with torch.no_grad():
        ref_outs = ref(torch.from_numpy(x).permute(0, 3, 1, 2))
    with jax.default_matmul_precision("highest"):
        my_outs = mine.apply(variables, jnp.asarray(x), train=False)

    errs = {}
    for stage in ["res2", "res3", "res4", "res5"]:
        rp = ref_outs[stage + "_pos"][0].numpy().astype(np.float32)
        rf = ref_outs[stage][0].numpy()
        mp = np.asarray(my_outs[stage + "_pos"][0], np.float32)
        mf = np.asarray(my_outs[stage][0])
        assert rp.shape == mp.shape, (stage, rp.shape, mp.shape)
        rp_s, rf_s = _sorted_by_pos(rp, rf)
        mp_s, mf_s = _sorted_by_pos(mp, mf)
        np.testing.assert_array_equal(
            rp_s, mp_s,
            err_msg=f"{stage}: token position sets differ (adaptive "
                    "downsampling diverged)",
        )
        errs[stage] = np.abs(rf_s - mf_s).max() / (np.abs(rf_s).max() + 1e-8)
    # wiring bugs show up as >=10% divergence (e.g. a wrong kv head split was
    # 0.196); cross-framework fp32 noise through softmax/erf stays ~1e-4/stage
    assert max(errs.values()) < 2e-3, f"per-stage max rel err: {errs}"
