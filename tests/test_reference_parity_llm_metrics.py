"""Differential parity of the end-to-end QA scoring + semantic-dissipation
layer against an oracle transcribed line-by-line from the reference
(``src/utils/llm_metrics.py:10-438``): normalization, strict JSON answer
extraction with nested coercion, greedy one-to-one list matching, set
variants, set_exact, the _SemanticAccumulator (s_ret_set/s_ret_vis/acc_hit/
acc_miss -> d_rate, d_mass, l_leak, l_iface + token bookkeeping), and the
global/per-window_k aggregation of ``evaluate_predictions``.

The repo implementation must reproduce the oracle's full metric dict on
randomized prediction records, including the protocol's corner cases (gold
answers that normalize to empty, duplicate answers, dict/nested-list
predictions, int-coerced visible_edge_ids).
"""

from __future__ import annotations

import json
import re
import string

import numpy as np
import pytest

from evi_rag_tpu.eval.llm_metrics import evaluate_predictions

# --------------------------------------------------------------------- #
# Oracle: reference llm_metrics transcription.
# --------------------------------------------------------------------- #


def _o_normalize(text):
    text = text.lower()
    exclude = set(string.punctuation)
    text = "".join(ch for ch in text if ch not in exclude)
    text = re.sub(r"\b(a|an|the)\b", " ", text)
    return " ".join(text.split())


def _o_coerce_item(item):
    if item is None:
        return []
    if isinstance(item, dict):
        for key in ("answers", "answer", "text", "name", "entity"):
            if key in item:
                return _o_coerce_item(item[key])
        return []
    if isinstance(item, (list, tuple)):
        out = []
        for sub in item:
            out.extend(_o_coerce_item(sub))
        return out
    text = item if isinstance(item, str) else str(item)
    text = text.strip()
    return [text] if text else []


def _o_extract(raw):
    parsed = json.loads(str(raw).strip())
    assert isinstance(parsed, dict) and "answers" in parsed
    values = parsed["answers"]
    assert isinstance(values, list)
    out = []
    for item in values:
        out.extend(_o_coerce_item(item))
    return out


def _o_match(pred, answer):
    return _o_normalize(pred) == _o_normalize(answer) or _o_normalize(answer) in _o_normalize(pred)


def _o_score_match(preds, golds):
    if not golds:
        return {"precision": 0.0, "recall": 0.0, "f1": 0.0}
    matched = 0
    remaining = preds.copy()
    for gold in golds:
        for pred in remaining:
            if _o_match(pred, gold):
                matched += 1
                remaining.remove(pred)
                break
    precision = matched / max(len(preds), 1)
    recall = matched / len(golds)
    f1 = 0.0 if precision + recall == 0 else 2 * precision * recall / (precision + recall)
    return {"precision": precision, "recall": recall, "f1": f1}


def _o_dedupe(values):
    seen, out = set(), []
    for v in values:
        n = _o_normalize(v)
        if not n or n in seen:
            continue
        seen.add(n)
        out.append(v)
    return out


def _o_score_answers(preds, golds):
    hit = 1.0 if preds and any(_o_match(p, a) for p in preds for a in golds) else 0.0
    ls = _o_score_match(preds, golds)
    ss = _o_score_match(_o_dedupe(preds), _o_dedupe(golds))
    pn = {_o_normalize(p) for p in preds if _o_normalize(p)}
    gn = {_o_normalize(g) for g in golds if _o_normalize(g)}
    return {
        "hit": hit, "precision": ls["precision"], "recall": ls["recall"], "f1": ls["f1"],
        "set_precision": ss["precision"], "set_recall": ss["recall"], "set_f1": ss["f1"],
        "set_exact": 1.0 if pn == gn else 0.0,
    }


class _OSem:
    """``_SemanticAccumulator`` (llm_metrics.py:174-273)."""

    def __init__(self):
        self.total = self.with_gt = self.hit_n = self.miss_n = 0
        self.set_hit = self.vis_hit = self.hit_s = self.miss_s = 0.0
        self.ev_s = self.pt_s = self.tb_s = self.kv_s = 0.0
        self.ev_n = self.pt_n = self.tb_n = self.kv_n = self.trunc = 0

    def update(self, f1, hit_set, hit_vis, ev, pt, tb, kv, truncated):
        self.total += 1
        if ev is not None:
            self.ev_s += int(ev); self.ev_n += 1
        if pt is not None:
            self.pt_s += int(pt); self.pt_n += 1
        if tb is not None:
            self.tb_s += int(tb); self.tb_n += 1
        if kv is not None:
            self.kv_s += int(kv); self.kv_n += 1
        if truncated:
            self.trunc += 1
        if hit_set is None or hit_vis is None or f1 is None:
            return
        self.with_gt += 1
        self.set_hit += float(hit_set)
        self.vis_hit += float(hit_vis)
        if hit_vis:
            self.hit_s += f1; self.hit_n += 1
        else:
            self.miss_s += f1; self.miss_n += 1

    def finalize(self, prefix):
        m = {f"{prefix}/total": float(self.total), f"{prefix}/with_gt": float(self.with_gt)}
        if self.with_gt > 0:
            s_set = self.set_hit / self.with_gt
            s_vis = self.vis_hit / self.with_gt
            acc_hit = self.hit_s / (self.hit_n or 1)
            acc_miss = self.miss_s / (self.miss_n or 1)
            m[f"{prefix}/s_ret_set"] = s_set
            m[f"{prefix}/s_ret_vis"] = s_vis
            m[f"{prefix}/acc_hit"] = acc_hit
            m[f"{prefix}/acc_miss"] = acc_miss
            m[f"{prefix}/d_rate"] = 1.0 - acc_hit
            m[f"{prefix}/d_mass"] = s_vis * (1.0 - acc_hit)
            m[f"{prefix}/l_leak"] = (1.0 - s_vis) * acc_miss
            m[f"{prefix}/l_iface"] = s_set - s_vis
        else:
            for k in ("s_ret_set", "s_ret_vis", "acc_hit", "acc_miss",
                      "d_rate", "d_mass", "l_leak", "l_iface"):
                m[f"{prefix}/{k}"] = 0.0
        if self.pt_n:
            m[f"{prefix}/avg_prompt_tokens"] = self.pt_s / self.pt_n
        if self.ev_n:
            m[f"{prefix}/avg_evidence_tokens"] = self.ev_s / self.ev_n
        if self.tb_n:
            m[f"{prefix}/avg_token_budget"] = self.tb_s / self.tb_n
            m[f"{prefix}/truncation_rate"] = self.trunc / self.tb_n
        if self.kv_n:
            m[f"{prefix}/avg_k_visible"] = self.kv_s / self.kv_n
        return m


def _o_as_int_list(values):
    if values is None:
        return []
    if isinstance(values, (list, tuple)):
        return [int(v) for v in values if v is not None]
    try:
        return [int(values)]
    except (TypeError, ValueError):
        return []


def _mean(xs):
    xs = list(xs)
    return float(sum(xs) / len(xs)) if xs else 0.0


def _oracle_evaluate(predictions):
    """``evaluate_predictions`` (llm_metrics.py:276-438)."""
    keys = ("hit", "precision", "recall", "f1",
            "set_precision", "set_recall", "set_f1", "set_exact")
    lists = {k: [] for k in keys}
    sem_global = _OSem()
    sem_by_w, base_by_w = {}, {}
    total = 0
    for item in predictions:
        golds = [a.strip() for a in item["answers"]]
        preds = _o_extract(item["prediction"])
        score = _o_score_answers(preds, golds)
        total += 1
        for k in keys:
            lists[k].append(score[k])
        hit_set = bool(item["hit_set"])
        hit_vis = bool(item["hit_vis"])
        kv = len(_o_as_int_list(item["visible_edge_ids"]))
        args = (score["f1"], hit_set, hit_vis, item["evidence_token_count"],
                item["prompt_token_count"], int(item["token_budget"]), kv,
                bool(item["evidence_truncated"]))
        sem_global.update(*args)
        wk = item.get("window_k")
        if wk is not None:
            wk = int(wk)
            bs = base_by_w.setdefault(wk, {k: [] for k in keys})
            for k in keys:
                bs[k].append(score[k])
            sem_by_w.setdefault(wk, _OSem()).update(*args)
    names = {"hit": "hit", "precision": "macro_precision", "recall": "macro_recall",
             "f1": "macro_f1", "set_precision": "answer_set_precision",
             "set_recall": "answer_set_recall", "set_f1": "answer_set_f1",
             "set_exact": "answer_set_exact"}
    m = {f"results/{names[k]}": _mean(lists[k]) for k in keys}
    m["results/total"] = float(total)
    m.update(sem_global.finalize("semantic"))
    for wk in sorted(base_by_w):
        for k in keys:
            m[f"results/window_{wk}/{names[k]}"] = _mean(base_by_w[wk][k])
        m[f"results/window_{wk}/total"] = float(len(base_by_w[wk]["hit"]))
    for wk in sorted(sem_by_w):
        m.update(sem_by_w[wk].finalize(f"semantic/window_{wk}"))
    return m


# --------------------------------------------------------------------- #
# Randomized record generation (protocol corner cases included).
# --------------------------------------------------------------------- #

_VOCAB = ["Paris", "the Louvre", "Mona Lisa!", "a cat", "New York City",
          "The", "42", "Jean d'Arc", "paris", "louvre museum"]


def _rand_pred_payload(rng):
    """A JSON prediction exercising the nested-coercion rules."""
    def leaf():
        c = rng.integers(0, 5)
        if c == 0:
            return rng.choice(_VOCAB)
        if c == 1:
            return {"answer": rng.choice(_VOCAB)}
        if c == 2:
            return {"text": [rng.choice(_VOCAB), None, int(rng.integers(0, 99))]}
        if c == 3:
            return [rng.choice(_VOCAB), {"entity": rng.choice(_VOCAB)}]
        return "  "  # whitespace-only -> dropped
    answers = [leaf() for _ in range(int(rng.integers(0, 4)))]
    return json.dumps({"answers": answers})


def _rand_records(seed, n=20):
    rng = np.random.default_rng(seed)
    records = []
    for i in range(n):
        golds = list(rng.choice(_VOCAB, size=int(rng.integers(1, 4))))
        if i % 7 == 0:
            golds.append("The")  # normalizes to "" -> matches everything
        vis = [int(v) for v in rng.integers(0, 50, size=int(rng.integers(0, 6)))]
        if i % 5 == 0:
            vis = None  # _as_int_list(None) -> []
        records.append({
            "id": f"s{i}",
            "answers": golds,
            "prediction": _rand_pred_payload(rng),
            "hit_set": bool(rng.integers(0, 2)),
            "hit_vis": int(rng.integers(0, 2)),  # 0/1 ints are accepted
            "visible_edge_ids": vis,
            "evidence_token_count": int(rng.integers(10, 500)),
            "prompt_token_count": int(rng.integers(50, 800)),
            "token_budget": int(rng.integers(100, 1000)),
            "evidence_truncated": bool(rng.integers(0, 2)),
            "window_k": int(rng.choice([1, 10, 25])) if rng.integers(0, 3) else None,
        })
    return records


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_evaluate_predictions_matches_reference_oracle(seed):
    records = _rand_records(seed)
    got = evaluate_predictions(records)
    want = _oracle_evaluate(records)
    assert set(got) == set(want), set(got) ^ set(want)
    for k in want:
        np.testing.assert_allclose(got[k], want[k], rtol=1e-12, err_msg=k)


def test_empty_normalized_gold_matches_everything():
    # "The" normalizes to "" and therefore substring-matches any prediction
    # (reference llm_metrics.py:79-80 has no empty-gold guard).
    rec = {
        "id": "x", "answers": ["The"],
        "prediction": json.dumps({"answers": ["anything at all"]}),
        "hit_set": True, "hit_vis": True, "visible_edge_ids": [1],
        "evidence_token_count": 5, "prompt_token_count": 9,
        "token_budget": 100, "evidence_truncated": False, "window_k": None,
    }
    m = evaluate_predictions([rec])
    assert m["results/hit"] == 1.0
    assert m["results/macro_recall"] == 1.0


def test_visible_edge_ids_scalar_and_none_coercion():
    base = {
        "id": "x", "answers": ["Paris"],
        "prediction": json.dumps({"answers": ["Paris"]}),
        "hit_set": True, "hit_vis": True,
        "evidence_token_count": 5, "prompt_token_count": 9,
        "token_budget": 100, "evidence_truncated": False, "window_k": None,
    }
    m_scalar = evaluate_predictions([{**base, "visible_edge_ids": 7}])
    assert m_scalar["semantic/avg_k_visible"] == 1.0
    m_none = evaluate_predictions([{**base, "visible_edge_ids": None}])
    assert m_none["semantic/avg_k_visible"] == 0.0
    m_mixed = evaluate_predictions([{**base, "visible_edge_ids": [3, None, 4]}])
    assert m_mixed["semantic/avg_k_visible"] == 2.0
