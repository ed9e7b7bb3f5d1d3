"""End-metric A/B for the STRATIFIED_TOPK uncertainty-ranking cap
(ADVICE r4 low #4).

The per-128-chunk capped top-k replaces the reference's global top-k over
the 3x-oversampled candidate pool (losses/point_sample.py STRATIFIED_TOPK;
reference criterion.py:161-167 / detectron2 point_rend).  The selection-
overlap test (tests/test_point_sample_pallas.py) measured the cap keeping
~90% of the global winners' uncertainty mass on 2-D boundaries but only
~64% on a 1-D horizontal band — so whether the cap affects TRAINING is
pinned here at the end-metric level: two identical overfit runs (same
seed/data/steps) with the cap on vs off, comparing the loss trajectory and
final matched-mask losses.

Runs tools/train_soak.py twice as subprocesses (module flag via SOAK_TOPK)
and writes STRATTOPK_AB_r05.json, pinned by
tests/test_point_sample_pallas.py::test_stratified_topk_ab_artifact_within_budget.

Usage: python tools/ab_stratified_topk.py [steps=600] [batch=4] [size=512]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.join(HERE, "..")


def _final(tag: str) -> dict:
    path = os.path.join(ROOT, f"SOAK_{tag}.jsonl")
    recs = [json.loads(line) for line in open(path)]
    last = recs[-3:]
    fin = {
        k: float(sum(r[k] for r in last) / len(last))
        for k in ("total_loss", "loss_ce", "loss_mask", "loss_dice")
    }
    fin["synthetic_miou"] = next(
        (r["synthetic_miou"] for r in reversed(recs) if "synthetic_miou" in r),
        None,
    )
    fin["steps"] = recs[-1]["step"] + 1
    fin["elapsed_s"] = recs[-1]["elapsed_s"]
    return {"final": fin, "curve_total_loss": [r["total_loss"] for r in recs]}


def main() -> None:
    steps = sys.argv[1] if len(sys.argv) > 1 else "600"
    batch = sys.argv[2] if len(sys.argv) > 2 else "4"
    size = sys.argv[3] if len(sys.argv) > 3 else "512"

    out = {}
    for mode, tag in (("capped", "ab_capped"), ("global", "ab_global")):
        env = dict(os.environ)
        env.update({
            "SOAK_TOPK": mode,
            "SOAK_TAG": tag,
            # don't clobber the production soak checkpoint
            "SOAK_CKPT": os.path.join(ROOT, f"soak_ckpt_{tag}.npz"),
        })
        print(f"=== {mode} ===", flush=True)
        subprocess.run(
            [sys.executable, os.path.join(HERE, "train_soak.py"),
             steps, batch, size],
            env=env, check=True,
        )
        out[mode] = _final(tag)
        os.remove(os.path.join(ROOT, f"soak_ckpt_{tag}.npz"))
        os.remove(os.path.join(ROOT, f"SOAK_{tag}.jsonl"))

    path = os.path.join(ROOT, "STRATTOPK_AB_r05.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps({m: v["final"] for m, v in out.items()}, indent=1))


if __name__ == "__main__":
    main()
