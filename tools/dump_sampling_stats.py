"""Measure the spatial locality of the pixel decoder's table-gather indices.

Runs the flagship backbone on the TPU to get REAL token positions, then
replays the deformable-sampling geometry (init-time offsets are bias-only and
analytic) in numpy to compute, per 128-sample gather tile, the spread of
finest-grid cell indices in (a) row-major and (b) Morton order.  This decides
whether a windowed in-kernel gather (K_SUB * 128-row dynamic windows) can
replace the XLA row gathers: the fast path needs spread <= K_SUB*128.

Tile order matches the planned kernel: per (query-level i, value-level j,
point k): 128 consecutive queries (space-filling order) x that k.

Usage: python tools/dump_sampling_stats.py [batch]
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")


def part1by1(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint32)
    x = (x | (x << 8)) & 0x00FF00FF
    x = (x | (x << 4)) & 0x0F0F0F0F
    x = (x | (x << 2)) & 0x33333333
    x = (x | (x << 1)) & 0x55555555
    return x


def morton(gx: np.ndarray, gy: np.ndarray) -> np.ndarray:
    return (part1by1(gx) | (part1by1(gy) << 1)).astype(np.int64)


def main() -> None:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 2

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_cfg
    from autofocusformermod_tpu.models import maskformer_from_config

    cfg = _flagship_cfg()
    model = maskformer_from_config(cfg)
    size = 512
    x = jnp.asarray(
        np.random.default_rng(0).uniform(0, 255, (batch, size, size, 3)),
        jnp.float32,
    )
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), x[:1], train=False)
    )()

    def m_backbone(mdl, x):
        return mdl.backbone(mdl.normalize(x).astype(mdl.compute_dtype))

    feats = jax.jit(
        lambda v, x: model.apply(v, x, method=m_backbone)
    )(variables, x)
    feats = jax.tree_util.tree_map(np.asarray, feats)

    # mirror the pixel decoder's setup: levels low->high res (res5, res4, res3)
    levels = ["res5", "res4", "res3"][::-1]  # res3, res4, res5? match order
    levels = ["res5", "res4", "res3"]
    levels = levels[::-1]  # transformer_in_features[::-1] = res5, res4, res3
    levels = ["res5", "res4", "res3"]
    poss = [feats[f + "_pos"] for f in levels]
    sss = [tuple(feats[f + "_spatial_shape"]) for f in levels]
    grid_hw = tuple(feats["res2_spatial_shape"])
    gh, gw = int(grid_hw[0]), int(grid_hw[1])
    h, l, k = 8, 3, 4

    # init offsets: bias-only fan-out (models/pixel_decoder.py _offset_init)
    thetas = np.arange(h, dtype=np.float32) * (2.0 * np.pi / h)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)
    grid = grid / np.abs(grid).max(-1, keepdims=True)
    grid = np.tile(grid.reshape(h, 1, 1, 2), (1, l, k, 1))
    for i in range(k):
        grid[:, :, i, :] *= i + 1
    offs = grid  # (h, l, k, 2)

    def scale(pos, ss_from, ss_to):
        r = np.asarray([ss_to[1] / ss_from[1], ss_to[0] / ss_from[0]])
        return (pos + 0.5) * r - 0.5

    print(f"grid {gh}x{gw}; levels {sss}")
    for i in range(l):
        pos_i = poss[i]  # (b, n_i, 2)
        n_i = pos_i.shape[1]
        for j in range(l):
            spreads_rm, spreads_mo = [], []
            s_pos = scale(pos_i, sss[i], sss[j])  # (b, n_i, 2)
            for hh in range(h):
                for kk in range(k):
                    loc = s_pos + offs[hh, j, kk]
                    sl = scale(loc, sss[j], (gh, gw))
                    gx = np.clip(np.round(sl[..., 0]), 0, gw - 1).astype(int)
                    gy = np.clip(np.round(sl[..., 1]), 0, gh - 1).astype(int)
                    cell_rm = gx + gy * gw            # (b, n_i)
                    cell_mo = morton(gx, gy)
                    for b in range(pos_i.shape[0]):
                        for t0 in range(0, n_i - 127, 128):
                            t = slice(t0, t0 + 128)
                            spreads_rm.append(
                                cell_rm[b, t].max() - cell_rm[b, t].min()
                            )
                            spreads_mo.append(
                                cell_mo[b, t].max() - cell_mo[b, t].min()
                            )
            srm = np.asarray(spreads_rm)
            smo = np.asarray(spreads_mo)
            def pct(a, q):
                return int(np.percentile(a, q))
            print(
                f"i={i} j={j}  rowmajor p50/p95/max "
                f"{pct(srm,50):6d}/{pct(srm,95):6d}/{srm.max():6d}   "
                f"morton p50/p95/max "
                f"{pct(smo,50):6d}/{pct(smo,95):6d}/{smo.max():6d}   "
                f"fit2048: rm {np.mean(srm<2048)*100:5.1f}% "
                f"mo {np.mean(smo<2048)*100:5.1f}%",
                flush=True,
            )


if __name__ == "__main__":
    main()
