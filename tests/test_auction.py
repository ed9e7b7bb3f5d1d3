"""On-device LSAP solvers (JV Hungarian, eps-scaling auction) vs scipy."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.optimize import linear_sum_assignment

from autofocusformermod_tpu.losses.auction import auction_lsap
from autofocusformermod_tpu.losses.lapjv import hungarian_lsap


def test_jv_exact_vs_scipy():
    for seed in range(8):
        rng = np.random.default_rng(seed)
        Q, T = 100, int(rng.integers(1, 101))
        cost = rng.standard_normal((2, Q, T)).astype(np.float32) * 5
        if seed % 2 == 0:  # matcher-style invalid sentinel columns
            cost[:, :, T - int(rng.integers(0, T)):] = 1e8
        a = np.asarray(hungarian_lsap(jnp.asarray(cost)))
        for i in range(2):
            assert len(set(a[i].tolist())) == T
            r, c = linear_sum_assignment(np.float64(cost[i]))
            opt = cost[i][r, c].sum()
            got = cost[i][a[i], np.arange(T)].sum()
            assert abs(got - opt) <= 1e-2 * max(1.0, abs(opt) / 1e4), (
                seed, i, got, opt,
            )


def test_auction_matches_scipy_cost():
    rng = np.random.default_rng(0)
    for trial in range(5):
        Q, T = 50, 30
        cost = rng.standard_normal((2, Q, T)).astype(np.float32) * 5
        assigned = np.asarray(auction_lsap(jnp.asarray(cost)))
        for b in range(2):
            # distinct queries
            assert len(set(assigned[b].tolist())) == T
            got = cost[b][assigned[b], np.arange(T)].sum()
            rows, cols = linear_sum_assignment(cost[b])
            opt = cost[b][rows, cols].sum()
            assert got <= opt + 0.05 * T, (trial, got, opt)


def test_auction_square_exactish():
    rng = np.random.default_rng(1)
    cost = rng.uniform(0, 10, (1, 20, 20)).astype(np.float32)
    assigned = np.asarray(auction_lsap(jnp.asarray(cost)))
    got = cost[0][assigned[0], np.arange(20)].sum()
    rows, cols = linear_sum_assignment(cost[0])
    opt = cost[0][rows, cols].sum()
    assert got <= opt + 0.5, (got, opt)


@pytest.mark.parametrize("device_backend", ["jv", "auction"])
def test_matcher_device_backends_match_scipy(device_backend):
    """hungarian_match with an on-device backend reaches the same assignment
    cost as the scipy host-callback backend on realistic matcher inputs."""
    import jax
    from autofocusformermod_tpu.losses import matcher as M

    key = jax.random.PRNGKey(0)
    b, q, t, h, w, nc, p = 2, 25, 8, 16, 16, 5, 64
    ks = jax.random.split(key, 6)
    logits = jax.random.normal(ks[0], (b, q, nc + 1))
    masks = jax.random.normal(ks[1], (b, q, h, w))
    labels = jax.random.randint(ks[2], (b, t), 0, nc)
    gt = (jax.random.normal(ks[3], (b, t, h, w)) > 0.5).astype(jnp.float32)
    valid = jnp.arange(t)[None, :] < jnp.array([[5], [8]])
    coords = jax.random.uniform(ks[4], (b, p, 2))

    outs = {}
    for backend in ("scipy", device_backend):
        M.set_matcher_backend(backend)
        try:
            outs[backend] = np.asarray(
                M.hungarian_match(
                    logits, masks, labels, gt, valid, coords,
                    cost_class=2.0, cost_mask=5.0, cost_dice=5.0,
                )
            )
        finally:
            M.set_matcher_backend(None)

    # assignments may differ at ties; compare achieved cost on valid slots
    def per_image_cost(i, assign):
        prob = np.asarray(jax.nn.softmax(logits[i], -1))
        cc = -prob[:, np.asarray(labels[i])]
        from autofocusformermod_tpu.losses.point_sample import point_sample
        cq = jnp.broadcast_to(coords[i][None], (q, p, 2))
        ct = jnp.broadcast_to(coords[i][None], (t, p, 2))
        op = point_sample(masks[i], cq)
        tp = point_sample(gt[i], ct)
        cm = np.asarray(M.batch_sigmoid_ce_cost(op, tp))
        cd = np.asarray(M.batch_dice_cost(op, tp))
        c = 5.0 * cm + 2.0 * cc + 5.0 * cd
        v = np.asarray(valid[i])
        return c[assign[np.nonzero(v)[0]], np.nonzero(v)[0]].sum()

    for i in range(b):
        cs = per_image_cost(i, outs["scipy"][i])
        ca = per_image_cost(i, outs[device_backend][i])
        assert abs(cs - ca) < 0.02, (i, cs, ca)
        # distinct assignment across all padded slots
        assert len(set(outs[device_backend][i].tolist())) == t


def test_auction_with_padded_invalid_columns():
    # invalid columns carry a large constant cost like the matcher produces
    rng = np.random.default_rng(2)
    Q, T = 20, 10
    cost = rng.standard_normal((1, Q, T)).astype(np.float32)
    cost[:, :, 6:] = 1e8
    assigned = np.asarray(auction_lsap(jnp.asarray(cost)))
    assert len(set(assigned[0].tolist())) == T
    got = cost[0][assigned[0][:6], np.arange(6)].sum()
    rows, cols = linear_sum_assignment(cost[0][:, :6])
    opt = cost[0][rows, cols].sum()
    assert got <= opt + 0.05 * T


def test_lsap_pallas_interpret_exact_vs_scipy():
    """The single-program Pallas JV (ops/pallas/lapjv_kernel.py) reaches the
    scipy optimum, interpret mode (runs on CPU)."""
    from autofocusformermod_tpu.ops.pallas.lapjv_kernel import lsap_pallas

    for seed in range(6):
        rng = np.random.default_rng(seed)
        Q, T = 100, int(rng.integers(1, 101))
        cost = rng.standard_normal((3, Q, T)).astype(np.float32) * 5
        if seed % 2 == 0:  # matcher-style invalid sentinel columns
            cost[:, :, T - int(rng.integers(0, T)):] = 1e8
        a = np.asarray(lsap_pallas(jnp.asarray(cost), interpret=True))
        for i in range(cost.shape[0]):
            assert len(set(a[i].tolist())) == T
            r, c = linear_sum_assignment(np.float64(cost[i]))
            opt = cost[i][r, c].sum()
            got = cost[i][a[i], np.arange(T)].sum()
            assert abs(got - opt) <= 1e-2 * max(1.0, abs(opt) / 1e4), (
                seed, i, got, opt,
            )


def test_lsap_pallas_interpret_matches_xla_jv():
    """Same assignments as the XLA hungarian_lsap (same algorithm, same
    tie-breaking) on matcher-shaped stacked costs."""
    from autofocusformermod_tpu.ops.pallas.lapjv_kernel import lsap_pallas

    rng = np.random.default_rng(42)
    cost = rng.standard_normal((8, 100, 20)).astype(np.float32) * 5
    cost[:, :, 15:] = 1e8
    a = np.asarray(lsap_pallas(jnp.asarray(cost), interpret=True))
    b = np.asarray(hungarian_lsap(jnp.asarray(cost)))
    np.testing.assert_array_equal(a, b)
