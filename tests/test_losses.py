"""Loss-stack tests: point sampling vs torch grid_sample, matcher optimality,
criterion integration."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from autofocusformermod_tpu.losses import (
    point_sample,
    get_uncertain_point_coords_with_randomness,
    hungarian_match,
    set_criterion,
)

RNG = np.random.default_rng(0)


def test_point_sample_matches_torch_grid_sample():
    import torch
    import torch.nn.functional as F

    masks = RNG.standard_normal((3, 7, 11)).astype(np.float32)
    coords = RNG.uniform(0, 1, (3, 17, 2)).astype(np.float32)

    ours = np.asarray(point_sample(jnp.asarray(masks), jnp.asarray(coords)))

    tm = torch.from_numpy(masks)[:, None]              # (n, 1, h, w)
    tc = torch.from_numpy(coords)[:, None]             # (n, 1, p, 2)
    ref = F.grid_sample(tm, 2.0 * tc - 1.0, align_corners=False)[:, 0, 0]
    np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-4, atol=1e-5)


def test_point_sample_out_of_bounds_zero_pad():
    masks = jnp.ones((1, 4, 4))
    coords = jnp.asarray([[[-0.5, 0.5], [1.5, 0.5], [0.5, 0.5]]])
    out = np.asarray(point_sample(masks, coords))
    assert out[0, 0] == 0.0 and out[0, 1] == 0.0 and out[0, 2] == 1.0


def test_uncertainty_sampling_shapes_and_range():
    key = jax.random.PRNGKey(0)
    logits = jnp.asarray(RNG.standard_normal((4, 8, 8)), jnp.float32)
    coords = get_uncertain_point_coords_with_randomness(key, logits, 16, 3.0, 0.75)
    assert coords.shape == (4, 16, 2)
    c = np.asarray(coords)
    assert c.min() >= 0 and c.max() <= 1


def test_hungarian_match_prefers_correct_queries():
    """Queries whose class and mask match a target must be matched to it."""
    b, q, t, nc, h, w = 1, 4, 2, 3, 8, 8
    logits = np.full((b, q, nc + 1), -5.0, np.float32)
    masks = np.full((b, q, h, w), -10.0, np.float32)
    gt_masks = np.zeros((b, t, h, w), np.float32)
    gt_labels = np.array([[0, 1]], np.int32)

    # query 2 predicts class 0 + left-half mask; query 0 class 1 + right half
    logits[0, 2, 0] = 5.0
    logits[0, 0, 1] = 5.0
    masks[0, 2, :, : w // 2] = 10.0
    masks[0, 0, :, w // 2 :] = 10.0
    gt_masks[0, 0, :, : w // 2] = 1.0
    gt_masks[0, 1, :, w // 2 :] = 1.0

    valid = np.ones((b, t), bool)
    coords = jax.random.uniform(jax.random.PRNGKey(1), (b, 256, 2))
    matched = np.asarray(
        hungarian_match(
            jnp.asarray(logits), jnp.asarray(masks), jnp.asarray(gt_labels),
            jnp.asarray(gt_masks), jnp.asarray(valid), coords,
            cost_class=2.0, cost_mask=5.0, cost_dice=5.0,
        )
    )
    assert matched[0, 0] == 2
    assert matched[0, 1] == 0


def test_hungarian_match_padded_targets_get_distinct_queries():
    b, q, t, nc, h, w = 2, 6, 4, 3, 8, 8
    logits = jnp.asarray(RNG.standard_normal((b, q, nc + 1)), jnp.float32)
    masks = jnp.asarray(RNG.standard_normal((b, q, h, w)), jnp.float32)
    gt_labels = jnp.asarray(RNG.integers(0, nc, (b, t)), jnp.int32)
    gt_masks = jnp.asarray(RNG.integers(0, 2, (b, t, h, w)), jnp.float32)
    valid = jnp.asarray([[True, True, False, False], [True, False, False, False]])
    coords = jax.random.uniform(jax.random.PRNGKey(2), (b, 128, 2))
    matched = np.asarray(
        hungarian_match(logits, masks, gt_labels, gt_masks, valid, coords,
                        cost_class=2.0, cost_mask=5.0, cost_dice=5.0)
    )
    for i in range(b):
        assert len(set(matched[i].tolist())) == t  # distinct queries


def _tiny_outputs_targets(b=2, q=5, t=3, nc=4, h=8, w=8, H=32, W=32, aux=2):
    def mk():
        return {
            "pred_logits": jnp.asarray(RNG.standard_normal((b, q, nc + 1)), jnp.float32),
            "pred_masks": jnp.asarray(RNG.standard_normal((b, q, h, w)), jnp.float32),
        }

    outputs = mk()
    outputs["aux_outputs"] = tuple(mk() for _ in range(aux))
    targets = {
        "labels": jnp.asarray(RNG.integers(0, nc, (b, t)), jnp.int32),
        "masks": jnp.asarray(RNG.integers(0, 2, (b, t, H, W)), jnp.float32),
        "valid": jnp.asarray([[True, True, False], [True, True, True]]),
    }
    return outputs, targets, nc


def test_set_criterion_structure_and_finiteness():
    outputs, targets, nc = _tiny_outputs_targets()
    total, losses = set_criterion(
        jax.random.PRNGKey(0), outputs, targets, nc, num_points=64
    )
    assert np.isfinite(float(total))
    for name in ("loss_ce", "loss_mask", "loss_dice",
                 "loss_ce_0", "loss_ce_1", "loss_mask_1", "loss_dice_0"):
        assert name in losses and np.isfinite(float(losses[name]))


def test_set_criterion_grad_flows():
    outputs, targets, nc = _tiny_outputs_targets(aux=0)

    def loss_fn(logits, masks):
        out = {"pred_logits": logits, "pred_masks": masks, "aux_outputs": ()}
        total, _ = set_criterion(
            jax.random.PRNGKey(0), out, targets, nc, num_points=64
        )
        return total

    g_logits, g_masks = jax.grad(loss_fn, argnums=(0, 1))(
        outputs["pred_logits"], outputs["pred_masks"]
    )
    assert np.isfinite(np.asarray(g_logits)).all()
    assert np.isfinite(np.asarray(g_masks)).all()
    assert float(jnp.abs(g_masks).sum()) > 0


def test_point_sample_shared_matches_point_sample():
    import jax
    from autofocusformermod_tpu.losses.point_sample import (
        point_sample, point_sample_shared,
    )

    key = jax.random.PRNGKey(3)
    m, h, w, p = 7, 13, 11, 50
    masks = jax.random.normal(key, (m, h, w))
    # include out-of-range coords to exercise the zero-padding branch
    coords = jax.random.uniform(jax.random.PRNGKey(4), (p, 2)) * 1.2 - 0.1
    ref = point_sample(masks, jnp.broadcast_to(coords[None], (m, p, 2)))
    got = point_sample_shared(masks, coords)
    assert jnp.max(jnp.abs(ref - got)) < 1e-6
