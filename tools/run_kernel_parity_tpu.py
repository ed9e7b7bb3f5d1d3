"""Run the TPU-only compiled-kernel parity tests on the REAL chip and commit
the outcome as KPARITY_<tag>.json (VERDICT r3 #7: the 10 CPU-tier skips must
be evidence-backed, not narrated).

Two tiers:
1. pytest, with PYTEST_REAL_TPU=1 so tests/conftest.py keeps the real
   backend: every test that the CPU tier skips with "needs TPU" runs
   compiled; outcomes recorded per nodeid.
2. direct measurements: for the main fused kernels, compute the compiled
   forward/VJP max relative error vs the XLA semantic reference at the
   production-like shapes the tests use, so the artifact carries numbers,
   not just green checkmarks.

Usage: python tools/run_kernel_parity_tpu.py  (needs the TPU; ~10-20 min of
remote compiles on a cold cache)
Env:   KPARITY_TAG=r05
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))

TPU_TEST_FILES = [
    "tests/test_msdetrpc_pallas.py",
    "tests/test_pallas.py",
    "tests/test_point_sample_pallas.py",
    "tests/test_decision_drift.py",
    "tests/test_amp.py",
]


def run_pytest_tier() -> dict:
    env = dict(os.environ)
    env["PYTEST_REAL_TPU"] = "1"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
    # interpret-mode exactness tests assert kernel-interpret == XLA
    # composition bit-for-bit, a CPU-semantics property: on the TPU backend
    # the XLA reference itself computes at TPU einsum precision, so those
    # belong to (and are green in) the CPU tier.  This tier's purpose is
    # COMPILED kernel parity.
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", *TPU_TEST_FILES, "-q", "-rA",
         "-k", "not interpret"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=5400,
    )
    out = proc.stdout + proc.stderr
    results = {}
    for line in out.splitlines():
        m = re.match(r"(PASSED|FAILED|SKIPPED|ERROR) (tests/\S+)", line)
        if m:
            results[m.group(2)] = m.group(1)
    tail = [ln for ln in out.splitlines() if " passed" in ln or " failed" in ln]
    return {"per_test": results, "summary": tail[-1] if tail else out[-200:],
            "returncode": proc.returncode}


def _rel(a, b):
    import numpy as np

    a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
    return float(np.abs(a - b).max() / (np.abs(b).max() + 1e-12))


def direct_measurements() -> dict:
    import numpy as np
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, REPO)
    from tests.test_msdetrpc_pallas import _make_case, _to_levels

    meas = {}

    # msdetrpc fused forward + VJP at the standard test case
    from autofocusformermod_tpu.ops.clusten import msdetrpc
    from autofocusformermod_tpu.ops.pallas.msdetrpc_kernel import (
        msdetrpc_pallas_levels,
        msdetrpc_pallas_levels_s,
    )

    nn_idx, nn_w, attn, val, sizes = _make_case(np.random.default_rng(0))
    idxs, ws = _to_levels(nn_idx, nn_w, attn, sizes)
    ref = msdetrpc(jnp.asarray(nn_idx), jnp.asarray(nn_w), jnp.asarray(attn),
                   jnp.asarray(val))
    out = msdetrpc_pallas_levels(idxs, ws, jnp.asarray(val), sizes)
    meas["msdetrpc_levels_fwd"] = {
        "shape": list(nn_idx.shape), "level_sizes": list(sizes),
        "max_rel_err": _rel(out, ref),
    }
    idx_s = jnp.concatenate(idxs, axis=2)
    w_s = jnp.concatenate(ws, axis=2)
    out_s = msdetrpc_pallas_levels_s(idx_s, w_s, jnp.asarray(val), sizes)
    meas["msdetrpc_levels_s_fwd"] = {
        "shape": list(idx_s.shape), "level_sizes": list(sizes),
        "max_rel_err": _rel(np.asarray(out_s).transpose(0, 2, 1), ref),
    }

    g = jnp.asarray(
        np.random.default_rng(1).standard_normal(ref.shape), jnp.float32)
    _, vjp_ref = jax.vjp(
        lambda ws_, v: msdetrpc_pallas_levels(idxs, ws_, v, sizes),
        tuple(ws), jnp.asarray(val),
    )
    # VJP rel err: compare pallas VJP against XLA autodiff of the same
    # folded-weight function (as tests/test_msdetrpc_pallas.py does)
    kpts = nn_idx.shape[2] // len(sizes)
    bh, n = nn_idx.shape[:2]

    def ref_fn(ws_, v):
        parts_i, parts_w = [], []
        for ki in range(kpts):
            for j in range(len(sizes)):
                parts_i.append(jnp.asarray(nn_idx[:, :, ki * len(sizes) + j]))
                parts_w.append(ws_[j].reshape(bh, n, kpts, 4)[:, :, ki, :])
        idx_full = jnp.stack(parts_i, axis=2)
        w_full = jnp.stack(parts_w, axis=2)
        ones = jnp.ones((bh, n, kpts * len(sizes)), jnp.float32)
        return msdetrpc(idx_full, w_full, ones, v)

    _, vjp_r = jax.vjp(ref_fn, tuple(ws), jnp.asarray(val))
    dws_r, dv_r = vjp_r(g)
    dws_p, dv_p = vjp_ref(g)
    meas["msdetrpc_levels_vjp"] = {
        "d_val_max_rel_err": _rel(dv_p, dv_r),
        "d_w_max_rel_err": max(_rel(a, b) for a, b in zip(dws_p, dws_r)),
    }

    # fused local attention (block-sparse flash) at real stage-1-like
    # geometry: concrete grid clustering, so this ALSO compiles and checks
    # the static visit-list kernels on the chip; VJP included
    try:
        from autofocusformermod_tpu.geometry.cluster import (
            space_filling_cluster,
        )
        from autofocusformermod_tpu.geometry.knn import knn
        from autofocusformermod_tpu.ops.pallas.local_attn import (
            _maybe_visit_lists,
            gather_composition,
            sfc_cluster_attention,
        )

        rng = np.random.default_rng(2)
        hi = wi = 32
        b, h, c_, m, nnc = 2, 4, 32, 8, 6
        n = hi * wi
        ys, xs = np.meshgrid(np.arange(hi), np.arange(wi), indexing="ij")
        pos0 = jnp.asarray(np.stack([xs, ys], 2).reshape(1, -1, 2),
                           jnp.float32)
        pos2, cmean, _, _, _ = space_filling_cluster(pos0, m, hi, wi)
        nc = jnp.broadcast_to(jnp.asarray(knn(pos2, cmean, nnc)),
                              (b, n, nnc))
        pos_b = jnp.broadcast_to(jnp.asarray(pos2), (b, n, 2))
        q, k, v = (jnp.asarray(rng.standard_normal((b, h, n, c_)) * 0.3,
                               jnp.float32) for _ in range(3))
        w5 = jnp.asarray(rng.standard_normal((h, 5)) * 0.1, jnp.float32)
        b5 = jnp.zeros((h,), jnp.float32)
        blank_k = jnp.asarray(rng.standard_normal((h, c_)) * 0.3,
                              jnp.float32)

        def run(fn, q, k, v):
            out, blank = fn(q, k, v, pos_b, nc, w5, b5, blank_k, m)
            return jnp.sum(out * out) + jnp.sum(blank * blank), (out, blank)

        (_, (ref_f, ref_b)), gr = jax.value_and_grad(
            lambda *a: run(gather_composition, *a), argnums=(0, 1, 2),
            has_aux=True)(q, k, v)
        (_, (got_f, got_b)), gp = jax.value_and_grad(
            lambda *a: run(sfc_cluster_attention, *a), argnums=(0, 1, 2),
            has_aux=True)(q, k, v)
        meas["sfc_cluster_attention"] = {
            "shape": [b, h, n, c_], "cluster_size": m, "nnc": nnc,
            "visit_lists_active": _maybe_visit_lists(nc, m, n) is not None,
            "feat_max_rel_err": _rel(got_f, ref_f),
            "blank_max_rel_err": _rel(got_b, ref_b),
            "grad_max_rel_err": max(_rel(a, b) for a, b in zip(gp, gr)),
        }
    except Exception as e:  # noqa: BLE001
        meas["sfc_cluster_attention"] = {"error": str(e)[:200]}

    return meas


def main() -> None:
    tag = os.environ.get("KPARITY_TAG", "r05")
    import jax

    backend = jax.default_backend()
    record = {"backend": backend, "device": str(jax.devices()[0])}
    if backend != "tpu":
        record["error"] = "no TPU attached; artifact not produced"
        print(json.dumps(record))
        sys.exit(1)
    record["direct"] = direct_measurements()
    record["pytest"] = run_pytest_tier()
    path = os.path.join(REPO, f"KPARITY_{tag}.json")
    with open(path, "w") as f:
        json.dump(record, f, indent=1)
    print(f"wrote {path}")
    print(json.dumps(record["direct"], indent=1))
    print(record["pytest"]["summary"])


if __name__ == "__main__":
    main()
