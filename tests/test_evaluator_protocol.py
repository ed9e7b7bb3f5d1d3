"""Bound the in-framework evaluators' deviation from the official protocols
(VERDICT r2 weak #7) in three tiers:

1. hand-derived values (pin exact interpolation / VOID-discount semantics);
2. UNCONDITIONAL cross-checks against in-test transcriptions of the
   published algorithms (pycocotools cocoeval.py evaluateImg+accumulate,
   panopticapi evaluation.py pq_compute_single_core+PQStat) on random blob
   data — these are independent reimplementations from the published
   protocol, not imports of framework code, so agreement is evidence;
3. the same cross-checks against the real libraries wherever they exist
   (absent from this image — no network — so tier 3 skips here, and also
   asserts transcription == library when it does run)."""

from collections import defaultdict

import numpy as np
import pytest

from autofocusformermod_tpu.evaluation import (
    InstanceSegEvaluator,
    PanopticEvaluator,
)


def _sq(h, w, y, x, dy, dx):
    m = np.zeros((h, w), bool)
    m[y:y + dy, x:x + dx] = True
    return m


def test_ap_hand_derived_two_detections():
    """COCO AP derived by hand through the 101-point interpolation.

    One class, one 64x64 image.  GT: A (10x10) and B (10x20).  Detections:
      d1 score .9 == A exactly              -> IoU 1.0  (TP at all 10 thrs)
      d2 score .8 covers 10x13 of B + 10x2 outside
           inter=130, union=200+150-130=220 -> IoU .5909 (TP at .50/.55 only)
      d3 score .7 disjoint                  -> FP at all thrs
    Per-threshold AP: thr in {.50,.55}: precision envelope 1.0 to recall 1.0
    -> AP_t = 1.  thr >= .60: only A matches; recall tops at .5 with
    precision 1, so 51 of the 101 recall points score 1 -> AP_t = 51/101.
    AP = (2*1 + 8*51/101)/10; AP50 = 1; AP75 = 51/101.
    """
    ev = InstanceSegEvaluator(num_classes=1)
    h = w = 64
    gt_a = _sq(h, w, 0, 0, 10, 10)
    gt_b = _sq(h, w, 20, 0, 10, 20)
    d1 = gt_a.copy()
    d2 = _sq(h, w, 20, 7, 10, 15)          # cols 7..21: 13 inside B, 2 outside
    assert (d2 & gt_b).sum() == 130 and (d2 | gt_b).sum() == 220
    d3 = _sq(h, w, 50, 50, 10, 10)
    ev.process(
        "img0",
        np.stack([d1, d2, d3]), np.zeros(3, int), np.array([0.9, 0.8, 0.7]),
        np.stack([gt_a, gt_b]), np.zeros(2, int),
    )
    res = ev.evaluate()
    exp_hi = 51 / 101
    assert abs(res["AP50"] - 100.0) < 1e-6
    assert abs(res["AP75"] - exp_hi * 100) < 1e-6
    assert abs(res["AP"] - (2 * 1.0 + 8 * exp_hi) / 10 * 100) < 1e-6


def test_pq_hand_derived():
    """PQ by hand with panopticapi's VOID discounts.

    class 0: gt 10x10 (cols 0..9), pred 10x12 (cols 2..13).  inter = 80;
    union discounts the prediction's 40 void pixels: 100+120-80-40 = 100
    -> IoU .8 > .5, TP, PQ0 = .8.
    class 1: gt segment missed (FN); the class-1 prediction lies entirely on
    void, so panopticapi does NOT count it as FP (void fraction > .5):
    PQ1 = 0/(0 + .5*0 + .5*1) = 0.  Mean over classes = 40.0."""
    ev = PanopticEvaluator(thing_ids={0}, num_classes=2)
    h = w = 40
    gt = np.zeros((h, w), np.int32)
    gt[0:10, 0:10] = 1                      # class 0 segment (100 px)
    gt[20:30, 0:10] = 2                     # class 1 segment
    pred = np.zeros((h, w), np.int32)
    pred[0:10, 2:14] = 1                    # class 0: IoU (void-disc) = .8
    pred[32:40, 20:30] = 2                  # class 1: all-void pred, no FP
    gt_info = [{"id": 1, "category_id": 0, "isthing": True},
               {"id": 2, "category_id": 1, "isthing": False}]
    pred_info = [{"id": 1, "category_id": 0, "isthing": True},
                 {"id": 2, "category_id": 1, "isthing": False}]
    ev.process(pred, pred_info, gt, gt_info)
    res = ev.evaluate()
    assert abs(res["PQ"] - (0.8 + 0.0) / 2 * 100) < 1e-6
    assert abs(res["PQ_th"] - 80.0) < 1e-6 and abs(res["PQ_st"]) < 1e-6

    # a second prediction mostly on REAL pixels of the wrong class DOES
    # count as FP: PQ1 denominator grows to .5FP + .5FN
    ev2 = PanopticEvaluator(thing_ids={0}, num_classes=2)
    pred2 = pred.copy()
    pred2[32:40, 20:30] = 0
    pred2[20:30, 0:10] = 0
    pred2[20:28, 0:10] = 3                  # class-1 pred ON gt seg 2, IoU .8/...
    pred_info2 = [{"id": 1, "category_id": 0, "isthing": True},
                  {"id": 3, "category_id": 1, "isthing": False}]
    ev2.process(pred2, pred_info2, gt, gt_info)
    r2 = ev2.evaluate()
    # class1: inter 80, union 100+80-80-0=100 -> IoU .8 TP
    assert abs(r2["PQ"] - (0.8 + 0.8) / 2 * 100) < 1e-6


def _rand_instances(seed, n_img=4, n_cls=3, hw=48):
    rng = np.random.default_rng(seed)
    data = []
    for i in range(n_img):
        n_gt, n_dt = rng.integers(1, 5), rng.integers(1, 7)
        def blobs(n):
            ms = []
            for _ in range(n):
                y, x = rng.integers(0, hw - 12, 2)
                dy, dx = rng.integers(6, 13, 2)
                ms.append(_sq(hw, hw, y, x, dy, dx))
            return np.stack(ms)
        data.append({
            "gt_masks": blobs(n_gt),
            "gt_cls": rng.integers(0, n_cls, n_gt),
            "dt_masks": blobs(n_dt),
            "dt_cls": rng.integers(0, n_cls, n_dt),
            "dt_scores": rng.random(n_dt),
        })
    return data


def _cocoeval_segm_oracle(data, n_cls):
    """Transcription of pycocotools cocoeval.py (evaluateImg + accumulate)
    for iouType='segm', areaRng=all, maxDets=100, no crowd/ignore —
    independent of the framework evaluator's code path.  Returns
    {AP, AP50, AP75} on the COCO 0-100 scale."""
    iou_thrs = np.linspace(0.5, 0.95, 10)
    rec_thrs = np.linspace(0.0, 1.0, 101)
    max_dets = 100

    # per (category, image): greedy per-threshold matching, score-ordered
    per_cat = {c: {"scores": [], "matched": [], "npig": 0}
               for c in range(n_cls)}
    for d in data:
        for c in range(n_cls):
            g_idx = np.nonzero(d["gt_cls"] == c)[0]
            d_idx = np.nonzero(d["dt_cls"] == c)[0]
            per_cat[c]["npig"] += len(g_idx)
            if len(d_idx) == 0:
                continue
            order = np.argsort(-d["dt_scores"][d_idx], kind="mergesort")
            d_idx = d_idx[order][:max_dets]
            scores = d["dt_scores"][d_idx]
            ious = np.zeros((len(d_idx), len(g_idx)))
            for di, dm in enumerate(d["dt_masks"][d_idx]):
                for gi, gm in enumerate(d["gt_masks"][g_idx]):
                    inter = np.logical_and(dm, gm).sum()
                    union = dm.sum() + gm.sum() - inter
                    ious[di, gi] = inter / union if union else 0.0
            dtm = np.zeros((len(iou_thrs), len(d_idx)), bool)
            for ti, t in enumerate(iou_thrs):
                gtm = np.zeros(len(g_idx), bool)
                for di in range(len(d_idx)):
                    best, m = min(t, 1 - 1e-10), -1
                    for gi in range(len(g_idx)):
                        if gtm[gi] or ious[di, gi] < best:
                            continue
                        best, m = ious[di, gi], gi
                    if m >= 0:
                        gtm[m] = True
                        dtm[ti, di] = True
            per_cat[c]["scores"].append(scores)
            per_cat[c]["matched"].append(dtm)

    # accumulate: global score sort per category, envelope, 101-pt sample
    precision = np.full((len(iou_thrs), len(rec_thrs), n_cls), -1.0)
    for c in range(n_cls):
        npig = per_cat[c]["npig"]
        if npig == 0 or not per_cat[c]["scores"]:
            continue
        scores = np.concatenate(per_cat[c]["scores"])
        dtm = np.concatenate(per_cat[c]["matched"], axis=1)
        order = np.argsort(-scores, kind="mergesort")
        dtm = dtm[:, order]
        tp = np.cumsum(dtm, axis=1).astype(float)
        fp = np.cumsum(~dtm, axis=1).astype(float)
        for ti in range(len(iou_thrs)):
            rc = tp[ti] / npig
            pr = tp[ti] / (tp[ti] + fp[ti] + np.spacing(1))
            pr = pr.tolist()
            for i in range(len(pr) - 1, 0, -1):
                if pr[i] > pr[i - 1]:
                    pr[i - 1] = pr[i]
            q = np.zeros(len(rec_thrs))
            inds = np.searchsorted(rc, rec_thrs, side="left")
            for ri, pi in enumerate(inds):
                if pi < len(pr):
                    q[ri] = pr[pi]
            precision[ti, :, c] = q

    def _mean(p):
        return float(np.mean(p[p > -1]) * 100) if (p > -1).any() else -1.0

    return {"AP": _mean(precision), "AP50": _mean(precision[0]),
            "AP75": _mean(precision[5])}


def test_ap_matches_published_algorithm():
    """UNCONDITIONAL cross-check of InstanceSegEvaluator against the
    transcribed pycocotools protocol on random blob predictions (several
    seeds; overlapping rectangles exercise ties, double matches, FPs)."""
    n_cls, hw = 3, 48
    for seed in (7, 21, 99):
        data = _rand_instances(seed, n_cls=n_cls, hw=hw)
        ev = InstanceSegEvaluator(num_classes=n_cls)
        for i, d in enumerate(data):
            ev.process(i, d["dt_masks"], d["dt_cls"], d["dt_scores"],
                       d["gt_masks"], d["gt_cls"])
        mine = ev.evaluate()
        ref = _cocoeval_segm_oracle(data, n_cls)
        for k in ("AP", "AP50", "AP75"):
            assert abs(mine[k] - ref[k]) < 1e-6, (seed, k, mine[k], ref[k])


def test_ap_matches_pycocotools_if_available():
    """Tier-3: same data through the real pycocotools, where installed;
    also certifies the transcription oracle against the library."""
    pycocotools = pytest.importorskip("pycocotools")  # noqa: F841
    from pycocotools import mask as maskutil
    from pycocotools.coco import COCO
    from pycocotools.cocoeval import COCOeval

    n_cls, hw = 3, 48
    data = _rand_instances(7, n_cls=n_cls, hw=hw)
    ev = InstanceSegEvaluator(num_classes=n_cls)
    images, anns, dets = [], [], []
    aid = 1
    for i, d in enumerate(data):
        ev.process(i, d["dt_masks"], d["dt_cls"], d["dt_scores"],
                   d["gt_masks"], d["gt_cls"])
        images.append({"id": i, "height": hw, "width": hw})
        for m, c in zip(d["gt_masks"], d["gt_cls"]):
            rle = maskutil.encode(np.asfortranarray(m.astype(np.uint8)))
            anns.append({"id": aid, "image_id": i, "category_id": int(c) + 1,
                         "segmentation": rle, "iscrowd": 0,
                         "area": float(m.sum()), "bbox": [0, 0, 1, 1]})
            aid += 1
        for m, c, s in zip(d["dt_masks"], d["dt_cls"], d["dt_scores"]):
            rle = maskutil.encode(np.asfortranarray(m.astype(np.uint8)))
            dets.append({"image_id": i, "category_id": int(c) + 1,
                         "segmentation": rle, "score": float(s)})
    gt = COCO()
    gt.dataset = {"images": images, "annotations": anns,
                  "categories": [{"id": c + 1} for c in range(n_cls)]}
    gt.createIndex()
    dt = gt.loadRes(dets)
    ce = COCOeval(gt, dt, iouType="segm")
    ce.evaluate(); ce.accumulate(); ce.summarize()
    mine = ev.evaluate()
    oracle = _cocoeval_segm_oracle(data, n_cls)
    assert abs(mine["AP"] - ce.stats[0] * 100) < 0.5
    assert abs(mine["AP50"] - ce.stats[1] * 100) < 0.5
    assert abs(oracle["AP"] - ce.stats[0] * 100) < 1e-6


class _PQStatLocal:
    """Transcription of panopticapi.evaluation.PQStat: per-category
    tp/fp/fn/iou accumulators + the published averaging rule (categories
    with tp+fp+fn == 0 are excluded from the mean)."""

    class _Cat:
        def __init__(self):
            self.tp = self.fp = self.fn = 0
            self.iou = 0.0

    def __init__(self):
        self.per_cat = defaultdict(self._Cat)

    def __getitem__(self, c):
        return self.per_cat[c]

    def pq_average(self, categories, isthing=None):
        pq = n = 0
        for c, info in categories.items():
            if isthing is not None and bool(info["isthing"]) != isthing:
                continue
            s = self.per_cat[c]
            if s.tp + s.fp + s.fn == 0:
                continue
            n += 1
            pq += s.iou / (s.tp + 0.5 * s.fp + 0.5 * s.fn)
        return ({"pq": pq / n if n else 0.0},)


def _pq_single_core(pq_stat, gt_pan, gt_info, dt_pan, dt_info):
    """Transcription of panopticapi's pq_compute_single_core per-image
    matching (file IO replaced with in-memory maps): intersection via the
    OFFSET trick, VOID-discounted unions, crowd handling, the >0.5-void FP
    exemption."""
    OFFSET = 256 * 256 * 256
    VOID = 0
    gt_segms = {el["id"]: el for el in gt_info}
    pred_segms = {el["id"]: el for el in dt_info}
    pan_gt_pred = (gt_pan.astype(np.uint64) * OFFSET
                   + dt_pan.astype(np.uint64))
    gt_pred_map = {}
    labels, labels_cnt = np.unique(pan_gt_pred, return_counts=True)
    for label, intersection in zip(labels, labels_cnt):
        gt_pred_map[(label // OFFSET, label % OFFSET)] = intersection
    gt_matched, pred_matched = set(), set()
    for (gt_label, pred_label), intersection in gt_pred_map.items():
        if gt_label not in gt_segms or pred_label not in pred_segms:
            continue
        if gt_segms[gt_label]["iscrowd"] == 1:
            continue
        if (gt_segms[gt_label]["category_id"]
                != pred_segms[pred_label]["category_id"]):
            continue
        union = (
            pred_segms[pred_label]["area"] + gt_segms[gt_label]["area"]
            - intersection - gt_pred_map.get((VOID, pred_label), 0)
        )
        iou = intersection / union
        if iou > 0.5:
            pq_stat[gt_segms[gt_label]["category_id"]].tp += 1
            pq_stat[gt_segms[gt_label]["category_id"]].iou += iou
            gt_matched.add(gt_label)
            pred_matched.add(pred_label)
    crowd_labels = defaultdict(int)
    for gt_label, gt_i in gt_segms.items():
        if gt_label in gt_matched:
            continue
        if gt_i["iscrowd"] == 1:
            crowd_labels[gt_i["category_id"]] = gt_label
            continue
        pq_stat[gt_i["category_id"]].fn += 1
    for pred_label, pred_i in pred_segms.items():
        if pred_label in pred_matched:
            continue
        intersection = gt_pred_map.get((VOID, pred_label), 0)
        if pred_i["category_id"] in crowd_labels:
            intersection += gt_pred_map.get(
                (crowd_labels[pred_i["category_id"]], pred_label), 0
            )
        if intersection / pred_i["area"] > 0.5:
            continue
        pq_stat[pred_i["category_id"]].fp += 1


def _rand_panoptic(seed, n_img=4, n_cls=3, hw=48):
    """Random rectangle panoptic maps in panopticapi's format: (pan_map,
    segments_info) pairs for gt and pred."""
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n_img):
        def seg_map(n):
            pan = np.zeros((hw, hw), np.uint32)
            info = []
            for k in range(n):
                y, x = rng.integers(0, hw - 12, 2)
                dy, dx = rng.integers(6, 13, 2)
                sid = 1 + k
                pan[y:y + dy, x:x + dx] = sid
                info.append({"id": int(sid),
                             "category_id": int(rng.integers(0, n_cls))})
            # drop entries fully overwritten by later rectangles
            info = [s for s in info if (pan == s["id"]).any()]
            for s in info:
                s["area"] = int((pan == s["id"]).sum())
                s["iscrowd"] = 0
            return pan, info

        gt_pan, gt_info = seg_map(int(rng.integers(1, 5)))
        dt_pan, dt_info = seg_map(int(rng.integers(1, 7)))
        out.append((gt_pan, gt_info, dt_pan, dt_info))
    return out


def _run_pq_cross_check(pq_stat_cls, seed=11, n_cls=3):
    categories = {c: {"id": c, "isthing": int(c == 0)} for c in range(n_cls)}
    pq_stat = pq_stat_cls()
    ev = PanopticEvaluator(thing_ids={0}, num_classes=n_cls)
    for gt_pan, gt_info, dt_pan, dt_info in _rand_panoptic(seed, n_cls=n_cls):
        _pq_single_core(pq_stat, gt_pan, gt_info, dt_pan, dt_info)
        ev.process(
            dt_pan.astype(np.int32),
            [{"id": s["id"], "category_id": s["category_id"],
              "isthing": s["category_id"] == 0} for s in dt_info],
            gt_pan.astype(np.int32),
            [{"id": s["id"], "category_id": s["category_id"],
              "isthing": s["category_id"] == 0} for s in gt_info],
        )
    lib_pq = pq_stat.pq_average(categories, isthing=None)[0]["pq"] * 100
    mine = ev.evaluate()
    assert abs(mine["PQ"] - lib_pq) < 0.5, (seed, mine["PQ"], lib_pq)


def test_pq_matches_published_algorithm():
    """UNCONDITIONAL cross-check of PanopticEvaluator against the
    transcribed panopticapi protocol (matching + PQStat averaging) on
    random overlapping-rectangle panoptic maps."""
    for seed in (11, 42, 137):
        _run_pq_cross_check(_PQStatLocal, seed=seed)


def test_pq_matches_panopticapi_if_available():
    """Tier-3: same cross-check with the real panopticapi PQStat, where
    installed (its file-IO wrapper is bypassed; the per-image matching is
    the transcription certified above)."""
    pytest.importorskip("panopticapi")
    from panopticapi.evaluation import PQStat

    _run_pq_cross_check(PQStat, seed=11)


# ---------------------------------------------------------------------------
# cityscapes instance AP (VERDICT r3 #6): official protocol transcribed from
# cityscapesscripts evalInstanceLevelSemanticLabeling.py (the reference runs
# that library in a subprocess, /root/reference/train_net.py:170-178)
# ---------------------------------------------------------------------------

from autofocusformermod_tpu.evaluation import (  # noqa: E402
    CityscapesInstanceEvaluator,
    LVISInstanceSegEvaluator,
)


def _cs_ap_curve_oracle(y_true, y_score, hard_fns):
    """Independent transcription of the exact-PR integration
    (evalInstanceLevelSemanticLabeling.py "compute precision recall curve"):
    ascending unique score thresholds, (r=0, p=1) endpoint, trapezoid via
    the [-0.5, 0, 0.5] recall convolution."""
    y_true = np.asarray(y_true, float)
    y_score = np.asarray(y_score, float)
    if y_score.size == 0:
        return 0.0
    o = np.argsort(y_score, kind="mergesort")
    ys, yt = y_score[o], y_true[o]
    cum = np.cumsum(yt)
    _, uniq = np.unique(ys, return_index=True)
    P, R = [], []
    for idx in uniq:
        c = cum[idx - 1] if idx > 0 else 0.0
        tp = cum[-1] - c
        fp = len(ys) - idx - tp
        fn = c + hard_fns
        P.append(tp / (tp + fp) if tp + fp else 0.0)
        R.append(tp / (tp + fn) if tp + fn else 0.0)
    P.append(1.0)
    R.append(0.0)
    rc = np.concatenate([[R[0]], R, [0.0]])
    return float(np.dot(P, np.convolve(rc, [-0.5, 0.0, 0.5], "valid")))


def _cityscapes_ap_oracle(data, n_cls, min_region=100):
    """Full protocol transcription: per class x overlap threshold, collect
    (y_true, y_score, hard_fns) with the non-exclusive >th matching,
    duplicate-match FPs, hard FNs, and the ignore-proportion FP filter
    (void + crowd + sub-minRegionSize gt pixels)."""
    overlaps = np.arange(0.5, 1.0, 0.05)
    ap = np.full((n_cls, len(overlaps)), np.nan)
    for c in range(n_cls):
        have_gt = any(
            (d["gt_cls"][j] == c and not d.get("gt_crowd", np.zeros(
                len(d["gt_cls"]), bool))[j]
             and d["gt_masks"][j].sum() >= min_region)
            for d in data for j in range(len(d["gt_cls"]))
        )
        if not have_gt:
            continue
        for oi, th in enumerate(overlaps):
            yt, ys, hard = [], [], 0
            for d in data:
                crowd = d.get("gt_crowd", np.zeros(len(d["gt_cls"]), bool))
                keep = [j for j in range(len(d["gt_cls"]))
                        if d["gt_cls"][j] == c and not crowd[j]
                        and d["gt_masks"][j].sum() >= min_region]
                ign = [j for j in range(len(d["gt_cls"]))
                       if crowd[j] or d["gt_masks"][j].sum() < min_region]
                dts = [i for i in range(len(d["dt_cls"]))
                       if d["dt_cls"][i] == c]
                iou = np.zeros((len(dts), len(keep)))
                for a, i in enumerate(dts):
                    dm = d["dt_masks"][i]
                    for b_, j in enumerate(keep):
                        gm = d["gt_masks"][j]
                        inter = np.logical_and(dm, gm).sum()
                        u = dm.sum() + gm.sum() - inter
                        iou[a, b_] = inter / u if u else 0.0
                for b_ in range(len(keep)):
                    hits = [a for a in range(len(dts)) if iou[a, b_] > th]
                    if not hits:
                        hard += 1
                        continue
                    ss = sorted((d["dt_scores"][dts[a]] for a in hits),
                                reverse=True)
                    yt.append(1.0); ys.append(ss[0])
                    for s in ss[1:]:
                        yt.append(0.0); ys.append(s)
                for a in range(len(dts)):
                    if len(keep) and (iou[a] > th).any():
                        continue
                    dm = d["dt_masks"][dts[a]]
                    n_ign = 0
                    if "void" in d:
                        n_ign += np.logical_and(dm, d["void"]).sum()
                    for j in ign:
                        n_ign += np.logical_and(dm, d["gt_masks"][j]).sum()
                    if dm.sum() and n_ign / dm.sum() <= th:
                        yt.append(0.0); ys.append(d["dt_scores"][dts[a]])
            ap[c, oi] = _cs_ap_curve_oracle(yt, ys, hard) if ys else 0.0
    valid = ~np.all(np.isnan(ap), axis=1)
    if not valid.any():
        return {"AP": 0.0, "AP50": 0.0}
    return {"AP": float(np.nanmean(ap[valid]) * 100),
            "AP50": float(np.nanmean(ap[valid][:, 0]) * 100)}


def test_cityscapes_ap_hand_derived():
    """Analytically derived expectations pin the protocol semantics."""
    hw = 48
    gt = _sq(hw, hw, 0, 0, 20, 20)                # 400 px

    # (a) one pred = 300-px subset of gt: IoU .75 exactly -> matches at the
    # 5 thresholds .50-.70 (strict >), misses .75-.95 -> AP 50, AP50 100
    ev = CityscapesInstanceEvaluator(1)
    ev.process(0, np.stack([_sq(hw, hw, 0, 0, 15, 20)]), [0], [0.9],
               np.stack([gt]), [0])
    r = ev.evaluate()
    assert abs(r["AP"] - 50.0) < 1e-6, r
    assert abs(r["AP50"] - 100.0) < 1e-6, r

    # (b) duplicate matches: two perfect preds on one gt -> the exact-PR
    # integration ignores the lower-scored duplicate FP -> AP 100
    ev = CityscapesInstanceEvaluator(1)
    ev.process(0, np.stack([gt, gt]), [0, 0], [0.9, 0.6], np.stack([gt]), [0])
    assert abs(ev.evaluate()["AP"] - 100.0) < 1e-6

    # (c) ignore region: a HIGH-scoring pred entirely on a crowd gt is
    # dropped (proportion 1 > th) -> AP stays 100; counted as FP it would
    # be 25 at every threshold (derived: P=[.5,0,1], R=[1,0,0])
    crowd = _sq(hw, hw, 30, 30, 15, 15)
    ev = CityscapesInstanceEvaluator(1)
    ev.process(0, np.stack([gt, crowd]), [0, 0], [0.8, 0.95],
               np.stack([gt, crowd]), [0, 0], gt_iscrowd=[0, 1])
    assert abs(ev.evaluate()["AP"] - 100.0) < 1e-6

    # (d) sub-minRegionSize gt (< 100 px) is ignored, not a hard FN; a pred
    # on it is dropped too
    tiny = _sq(hw, hw, 40, 0, 8, 8)               # 64 px < 100
    ev = CityscapesInstanceEvaluator(1)
    ev.process(0, np.stack([gt, tiny]), [0, 0], [0.8, 0.95],
               np.stack([gt, tiny]), [0, 0])
    assert abs(ev.evaluate()["AP"] - 100.0) < 1e-6


def test_cityscapes_ap_matches_transcription():
    """Framework CityscapesInstanceEvaluator == the in-test transcription on
    random blob data (several seeds; overlaps, duplicates, crowds, voids)."""
    n_cls, hw = 3, 48
    for seed in (7, 21, 99):
        rng = np.random.default_rng(seed)
        data = _rand_instances(seed, n_cls=n_cls, hw=hw)
        for d in data:
            # inflate some blobs above minRegionSize=100 so the size filter
            # sees both sides (default 6-12 px sides are mostly < 100 px)
            for arr in ("gt_masks", "dt_masks"):
                for j in range(len(d[arr])):
                    if rng.random() < 0.6:
                        ys_, xs_ = np.nonzero(d[arr][j])
                        y0, x0 = ys_.min(), xs_.min()
                        d[arr][j] = _sq(hw, hw, min(y0, hw - 16),
                                        min(x0, hw - 16), 14, 14)
            d["gt_crowd"] = rng.random(len(d["gt_cls"])) < 0.25
            d["void"] = _sq(hw, hw, 40, 40, 8, 8).astype(bool)
        ev = CityscapesInstanceEvaluator(n_cls)
        for i, d in enumerate(data):
            ev.process(i, d["dt_masks"], d["dt_cls"], d["dt_scores"],
                       d["gt_masks"], d["gt_cls"],
                       gt_iscrowd=d["gt_crowd"].astype(int),
                       void_mask=d["void"])
        mine = ev.evaluate()
        ref = _cityscapes_ap_oracle(data, n_cls)
        for k in ("AP", "AP50"):
            assert abs(mine[k] - ref[k]) < 1e-6, (seed, k, mine[k], ref[k])


def test_cityscapes_vs_coco_protocol_deviation_bounded():
    """Quantify the COCO-protocol evaluator's deviation from the official
    cityscapes protocol on the same synthetic data: the protocols share the
    matching scale, so AP differs only by matching exclusivity + integration
    method.  Measured deviation on random blobs is bounded at 15 points
    (0-100 scale); the dispatch in engine/train.py uses the OFFICIAL
    protocol for cityscapes datasets, so this bound documents the r2/r3
    deviation rather than shipping it."""
    n_cls, hw = 3, 48
    devs = []
    for seed in (7, 21, 99, 5):
        data = _rand_instances(seed, n_cls=n_cls, hw=hw)
        cs = CityscapesInstanceEvaluator(n_cls)
        coco = InstanceSegEvaluator(n_cls)
        for i, d in enumerate(data):
            for e in (cs, coco):
                e.process(i, d["dt_masks"], d["dt_cls"], d["dt_scores"],
                          d["gt_masks"], d["gt_cls"])
        devs.append(abs(cs.evaluate()["AP"] - coco.evaluate()["AP"]))
    assert max(devs) < 15.0, devs


# ---------------------------------------------------------------------------
# LVIS federated AP (VERDICT r3 #6): transcribed from the lvis-api LVISEval
# semantics (the reference uses LVISEvaluator, train_net.py:201-203)
# ---------------------------------------------------------------------------


def test_lvis_federated_equals_coco_when_exhaustive():
    """On exhaustively annotated data (every image positive or explicitly
    negative for every class, <= 100 dets/img) the federated protocol
    COLLAPSES to COCO: identical AP.  This is the bound for cocofied-LVIS
    eval, whose annotations are exhaustive."""
    n_cls, hw = 3, 48
    for seed in (7, 21):
        data = _rand_instances(seed, n_cls=n_cls, hw=hw)
        lvis = LVISInstanceSegEvaluator(n_cls)
        coco = InstanceSegEvaluator(n_cls)
        for i, d in enumerate(data):
            negs = [c for c in range(n_cls) if c not in set(d["gt_cls"])]
            lvis.process(i, d["dt_masks"], d["dt_cls"], d["dt_scores"],
                         d["gt_masks"], d["gt_cls"], neg_categories=negs)
            coco.process(i, d["dt_masks"], d["dt_cls"], d["dt_scores"],
                         d["gt_masks"], d["gt_cls"])
        rl, rc = lvis.evaluate(), coco.evaluate()
        for k in ("AP", "AP50", "AP75"):
            assert abs(rl[k] - rc[k]) < 1e-9, (seed, k, rl[k], rc[k])


def test_lvis_federated_ignores_unannotated_and_nonexhaustive():
    """The federated rules that make LVIS AP differ from COCO AP:
    (a) a detection on an image where its class is neither positive nor
    negative is DROPPED (absence of gt is not evidence of absence);
    (b) an unmatched detection on a not-exhaustively-annotated image is
    dropped rather than counted FP.  Both would be score-leading FPs under
    COCO and lower its AP."""
    hw = 48
    gt = _sq(hw, hw, 0, 0, 20, 20)
    other = _sq(hw, hw, 28, 28, 15, 15)

    def run(ev_cls, **kw0):
        ev = ev_cls(1)
        # img 0: class-0 gt + perfect pred (TP, score .8)
        ev.process(0, np.stack([gt]), [0], [0.8], np.stack([gt]), [0],
                   **({"neg_categories": []} if ev_cls is
                      LVISInstanceSegEvaluator else {}))
        # img 1: no class-0 annotation at all; high-scoring class-0 det
        ev.process(1, np.stack([other]), [0], [0.95],
                   np.zeros((0, hw, hw), bool), [], **kw0)
        return ev.evaluate()["AP"]

    ap_coco = run(InstanceSegEvaluator)
    ap_lvis = run(LVISInstanceSegEvaluator)
    assert abs(ap_lvis - 100.0) < 1e-9          # det on img1 dropped
    assert ap_coco < ap_lvis                    # COCO counts it as FP

    # (b) not-exhaustive image: unmatched det dropped, matched det still TP
    ev = LVISInstanceSegEvaluator(1)
    ev.process(0, np.stack([gt, other]), [0, 0], [0.8, 0.95],
               np.stack([gt]), [0], neg_categories=[],
               not_exhaustive_categories=[0])
    assert abs(ev.evaluate()["AP"] - 100.0) < 1e-9
