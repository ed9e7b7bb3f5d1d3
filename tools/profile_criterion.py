"""Decompose the criterion's 300+ ms: matching costs, LSAP solve, stacked
point-sampled mask losses, label CE — each timed as its own jitted program on
real flagship-shaped outputs (one actual model forward supplies the shapes).

Usage: python tools/profile_criterion.py [batch] [iters]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> None:
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_cfg
    from autofocusformermod_tpu.losses import criterion as C
    from autofocusformermod_tpu.losses.matcher import matching_cost, solve_lsap
    from autofocusformermod_tpu.models import maskformer_from_config

    cfg = _flagship_cfg()
    model = maskformer_from_config(cfg)
    H = W = 512
    t = 20
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.uniform(0, 255, (b, H, W, 3)), jnp.float32)
    tgt_labels = jnp.asarray(rng.integers(0, 150, (b, t)), jnp.int32)
    tgt_masks = jnp.asarray((rng.uniform(size=(b, t, H, W)) > 0.7), jnp.float32)
    tgt_valid = jnp.asarray(rng.uniform(size=(b, t)) > 0.3)

    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), image[:1], train=False)
    )()
    print("forward for shapes...", flush=True)
    outputs = jax.jit(
        lambda v, x: model.apply(
            v, x, train=True, mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(1)}
        )[0]
    )(variables, image)
    outputs = jax.tree.map(lambda a: jnp.asarray(np.asarray(a)), outputs)
    all_outputs = [outputs] + list(outputs.get("aux_outputs", ()))
    L = len(all_outputs)
    print(f"L={L} pred_masks={all_outputs[0]['pred_masks'].shape} "
          f"logits={all_outputs[0]['pred_logits'].shape}", flush=True)

    num_points = 12544

    def timed(name, fn, *args):
        t0 = time.perf_counter()
        salt = jnp.zeros(())
        r = fn(*args, salt)
        jax.block_until_ready(r)
        float(jnp.sum(r[0] if isinstance(r, tuple) else r))
        comp = time.perf_counter() - t0
        salt = jnp.float32(float(jnp.sum(r[0] if isinstance(r, tuple) else r)) * 1e-12)
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(*args, salt)
            s = r[0] if isinstance(r, tuple) else r
            salt = jnp.sum(s.astype(jnp.float32)).astype(jnp.float32) * 1e-12
        float(salt)
        ms = 1e3 * (time.perf_counter() - t0) / iters
        print(f"{name:28s} {ms:8.1f} ms  [compile {comp:.0f}s]", flush=True)
        return ms

    # (a) matching costs, all layers
    @jax.jit
    def f_costs(lg, pm, salt):
        key = jax.random.PRNGKey(0)
        cs = []
        for i in range(L):
            key, k = jax.random.split(key)
            pc = jax.random.uniform(k, (b, num_points, 2))
            cs.append(matching_cost(lg[i], pm[i] + salt, tgt_labels, tgt_masks,
                                    tgt_valid, pc, 2.0, 5.0, 5.0))
        return jnp.stack(cs)

    lg = [o["pred_logits"] for o in all_outputs]
    pm = [o["pred_masks"] for o in all_outputs]
    timed("matching_cost x L", f_costs, lg, pm)

    # (b) LSAP solve on stacked costs
    costs = jax.jit(lambda lg, pm: f_costs(lg, pm, jnp.zeros(())))(lg, pm)
    cflat = costs.reshape(L * b, *costs.shape[2:])

    @jax.jit
    def f_lsap(c, salt):
        return solve_lsap(c + salt)

    timed("solve_lsap (stacked)", f_lsap, cflat)

    matched = jax.jit(f_lsap)(cflat, jnp.zeros(()))

    # (c) stacked mask loss (single group, L layers)
    q = pm[0].shape[1]
    hw = pm[0].shape[-2:]

    @jax.jit
    def f_maskloss(pm, m, salt):
        srcs = []
        for i in range(L):
            srcs.append(jnp.take_along_axis(
                pm[i] + salt, m[i * b:(i + 1) * b][:, :, None, None], axis=1
            ).reshape(b * t, *hw))
        src_flat = jnp.concatenate(srcs, axis=0)
        tgt_flat = jnp.broadcast_to(
            tgt_masks.reshape(1, b * t, H, W), (L, b * t, H, W)
        ).reshape(L * b * t, H, W).astype(src_flat.dtype)
        lm, ld = C._loss_masks_stacked(
            jax.random.PRNGKey(2), src_flat, tgt_flat, num_points, 3.0, 0.75)
        return lm + ld

    timed("stacked mask loss", f_maskloss, pm, matched)

    # (c2) its pieces: uncertainty coords; pred sample; tgt sample
    N = L * b * t
    src_flat = jnp.concatenate([
        jnp.take_along_axis(pm[i], matched[i * b:(i + 1) * b][:, :, None, None],
                            axis=1).reshape(b * t, *hw) for i in range(L)
    ], axis=0)
    tgt_flat = jnp.broadcast_to(
        tgt_masks.reshape(1, b * t, H, W), (L, b * t, H, W)
    ).reshape(N, H, W).astype(src_flat.dtype)

    @jax.jit
    def f_coords(sf, salt):
        return C._uncertain_coords(jax.random.PRNGKey(2), sf + salt,
                                   num_points, 3.0, 0.75)

    timed("  uncertainty coords", f_coords, src_flat)
    coords = jax.jit(f_coords)(src_flat, jnp.zeros(()))

    from autofocusformermod_tpu.losses.point_sample import point_sample_auto

    @jax.jit
    def f_ps_pred(sf, c, salt):
        return point_sample_auto(sf + salt, c)

    timed("  point_sample preds", f_ps_pred, src_flat, coords)

    @jax.jit
    def f_ps_tgt(tf, c, salt):
        return point_sample_auto(tf + salt, c)

    timed("  point_sample targets", f_ps_tgt, tgt_flat, coords)

    # (d) label CE x L
    @jax.jit
    def f_labels(lg, m, salt):
        tot = 0.0
        for i in range(L):
            tot = tot + C._loss_labels(lg[i] + salt, tgt_labels, tgt_valid,
                                       m[i * b:(i + 1) * b], 150, 0.1)
        return tot

    timed("label CE x L", f_labels, lg, matched)

    # (e) whole criterion for reference
    @jax.jit
    def f_crit(outs, salt):
        outs = dict(outs)
        outs["pred_masks"] = outs["pred_masks"] + salt
        tot, _ = C.set_criterion(
            jax.random.PRNGKey(3), outs,
            {"labels": tgt_labels, "masks": tgt_masks, "valid": tgt_valid}, 150)
        return tot

    timed("set_criterion (whole)", f_crit, outputs)


if __name__ == "__main__":
    main()
