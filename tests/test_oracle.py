"""Oracle upsampling-mask machinery tests."""

import numpy as np
import jax
import jax.numpy as jnp

from autofocusformermod_tpu.models.oracle import (
    gt_edge_map,
    mix_teacher_mask,
    oracle_upsampling_mask,
    upsampling_mse_loss,
)


def test_edge_map_marks_boundaries():
    sem = np.zeros((1, 8, 8), np.int32)
    sem[:, :, 4:] = 1
    e = np.asarray(gt_edge_map(jnp.asarray(sem)))
    assert e[0, :, 3].all()          # vertical boundary column
    assert e[0, :, :3].sum() == 0    # interior clean


def test_oracle_scores_higher_on_edge_patches():
    sem = np.zeros((1, 32, 32), np.int32)
    sem[:, :, 16:] = 1
    edges = gt_edge_map(jnp.asarray(sem))
    # 4 tokens at scale 0 (patch 16) on min-patch-4 canvas coords
    pos = jnp.asarray([[[0, 0], [4, 0], [0, 4], [4, 4]]], jnp.float32)
    scale = jnp.zeros((1, 4))
    scores = np.asarray(
        oracle_upsampling_mask(edges, pos, scale, patch_sizes=[16, 8, 4],
                               min_patch_size=4)
    )
    # the one-sided edge map marks column 15, inside the x in [0,16) patches
    assert scores[0, 0] == 1.0 and scores[0, 2] == 1.0
    assert scores[0, 1] == 0.0 and scores[0, 3] == 0.0


def test_teacher_mixing_and_mse():
    key = jax.random.PRNGKey(0)
    pred = jnp.zeros((4, 10))
    oracle = jnp.ones((4, 10))
    mixed = mix_teacher_mask(key, pred, oracle, 1.0)
    np.testing.assert_array_equal(np.asarray(mixed), np.ones((4, 10)))
    mixed0 = mix_teacher_mask(key, pred, oracle, 0.0)
    np.testing.assert_array_equal(np.asarray(mixed0), np.zeros((4, 10)))

    loss = upsampling_mse_loss([pred], [oracle])
    assert abs(float(loss) - 1.0) < 1e-6
    # gradient flows to predictions, not the oracle
    g = jax.grad(lambda p: upsampling_mse_loss([p], [oracle]))(pred)
    assert float(jnp.abs(g).sum()) > 0
