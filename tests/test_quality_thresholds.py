"""Quality-regression gate in the test lane (VERDICT r4 #8).

The reference's de-facto quality signal is the retriever metric suite
(`/root/reference/src/metrics/retriever_metrics.py`); this repo's toy lane
proved the metrics non-degenerate (docs/RESULTS_synthetic.md hardness sweep).
This test makes quality a FAILING condition, not just a report: a compact
synthetic train run must clear measured floors on edge recall@10, bridge
separation, and probability separation gap, and a deliberately-broken scorer
(random logits through the same metric plumbing) must land BELOW those
floors -- guarding both the model/loss stack and the metric implementations
(a metric that always reports 1.0 would fail the negative control).

The task plants fixed 3-hop paths with WITHIN-LAYER distractors
(``layered_distractors=True``): the planted path is provably the unique
shortest path, so its middle edge is a structurally-guaranteed bridge
positive in every graph and bridge metrics are non-degenerate at this scale
(VERDICT r4 weak #5).

Thresholds sit well under the measured values of this exact config and well
above the broken-scorer values (see the calibration block below) so
shuffle/seed noise does not flake the lane while real regressions -- a
broken loss, a scoring-path sign flip, DDE feature corruption -- trip it.
"""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow

# emb=128 is the measured threshold where bridge separation turns positive
# on this synthetic family (round-3 hardness x capacity sweep,
# docs/RESULTS_synthetic.md); below it the metric hovers around zero.
SAMPLES = 64
EMB = 128
EPOCHS = 16
KS = (1, 10, 25)

# Calibration (CPU, dataset seeds {0,7}/{100,107}, noise key 0):
#   trained: recall@10 0.92/0.71, bridge_sep 0.376/0.381, sep_gap 0.416/0.421
#   broken:  recall@10 0.54/0.38, bridge_sep 0.077/0.104, sep_gap 0.038
# (edge/margin_positive_rate measured 0.125/0.0 -- min-pos>max-neg over a
# whole 3-hop graph is brittle at this scale, so the gate uses the mean
# probability separation gap instead.)
MIN_RECALL_AT_10 = 0.60
MIN_BRIDGE_SEPARATION = 0.15
MIN_SEPARATION_GAP = 0.20


@pytest.fixture(scope="module")
def trained():
    from evi_rag_tpu.data.feeder import (
        collate_retriever,
        fixed_bucket_for,
        iter_stacked_batches,
    )
    from evi_rag_tpu.data.synthetic import make_synthetic_dataset
    from evi_rag_tpu.models.losses import RetrieverLossConfig
    from evi_rag_tpu.models.retriever import Retriever
    from evi_rag_tpu.train.optim import OptimizerConfig
    from evi_rag_tpu.train.retriever_trainer import (
        RetrieverTrainConfig,
        evaluate,
        fit,
        make_eval_step,
    )

    # Same task shape as scripts/benchmark_quality.py: relation-distinctive
    # answers (overlap 0.15) so margins/separation measure learning, not
    # plumbing.  avg_extra_edges compensates for the within-layer keep rule
    # (~1/(plen+1) of drawn distractors survive) so graphs stay dense enough
    # that a random scorer does NOT clear recall@10.
    kw = dict(
        emb_dim=EMB, max_nodes=32, distractor_relation_overlap=0.15,
        path_len_range=(3, 3), layered_distractors=True, avg_extra_edges=5.0,
    )
    train_ds = make_synthetic_dataset(num_samples=SAMPLES, seed=0, **kw)
    test_ds = make_synthetic_dataset(num_samples=16, seed=100, **kw)
    model = Retriever(emb_dim=EMB, hidden_dim=EMB, dropout_p=0.0)
    cfg = RetrieverTrainConfig(
        # bce_weight>0 calibrates sigmoid probabilities -- bridge/separation
        # is measured in probability space (mean sigmoid(pos) - sigmoid(neg)
        # over bridge edges), so pure-InfoNCE logits (ranking-only) leave it
        # structurally ~0 regardless of ranking quality.
        loss=RetrieverLossConfig(bce_weight=1.0),
        optimizer=OptimizerConfig(name="adamw", learning_rate=3e-3, grad_clip_norm=1.0),
        max_epochs=EPOCHS,
        # Monitor the probability-space metric: recall@10 saturates within a
        # couple of epochs on this task and would freeze best_params before
        # the BCE head calibrates.
        monitor="bridge/separation",
        k_values=KS,
        patience=EPOCHS,
    )
    bucket = fixed_bucket_for(train_ds.samples + test_ds.samples, 8)
    kw_tr = dict(
        entity_emb=train_ds.entity_emb, relation_emb=train_ds.relation_emb,
        question_emb=train_ds.question_emb,
    )
    kw_te = dict(
        entity_emb=test_ds.entity_emb, relation_emb=test_ds.relation_emb,
        question_emb=test_ds.question_emb,
    )

    def train_batches(epoch):
        return iter_stacked_batches(
            train_ds.samples, num_shards=1, per_shard_batch=8, bucket=bucket,
            seed=epoch, **kw_tr,
        )

    def test_batches():
        for i in range(0, len(test_ds.samples), 8):
            yield collate_retriever(test_ds.samples[i : i + 8], bucket=bucket, **kw_te)

    best_params, _ = fit(model, cfg, train_batches, test_batches, seed=0)
    eval_step = make_eval_step(model, cfg)
    metrics = evaluate(best_params, eval_step, test_batches())
    return metrics, (model, cfg, best_params, test_batches)


def test_bridge_positives_structurally_present(trained):
    """The layered 3-hop generator must make bridge metrics non-degenerate:
    every graph carries a positive edge touching neither a topic nor an
    answer node (the planted path's middle edge)."""
    metrics, _ = trained
    assert metrics["bridge/pos_graph_frac"] == 1.0, metrics


def test_trained_retriever_clears_quality_floors(trained):
    metrics, _ = trained
    assert metrics["edge/recall@10"] >= MIN_RECALL_AT_10, metrics
    assert metrics["bridge/separation"] >= MIN_BRIDGE_SEPARATION, metrics
    assert metrics["features/separation_gap"] >= MIN_SEPARATION_GAP, metrics


def test_broken_scorer_fails_quality_floors(trained):
    """Negative control: the SAME metric plumbing fed by a deliberately
    broken scorer (logits replaced by seeded noise) must land below the
    floors -- otherwise the gate above is vacuous."""
    import jax

    from evi_rag_tpu.train.retriever_trainer import evaluate, make_eval_step

    metrics, (model, cfg, best_params, test_batches) = trained

    class _BrokenModel:
        """Wraps the real model but replaces logits with seeded noise."""

        def apply(self, params, batch, **kw):
            import dataclasses

            out = model.apply(params, batch, **kw)
            noise = jax.random.normal(jax.random.key(0), out.logits.shape)
            return dataclasses.replace(out, logits=noise)

    eval_step = make_eval_step(_BrokenModel(), cfg)
    broken = evaluate(best_params, eval_step, test_batches())
    assert broken["bridge/separation"] < MIN_BRIDGE_SEPARATION, broken
    assert broken["features/separation_gap"] < MIN_SEPARATION_GAP, broken
    # And the trained model must beat the broken one outright on ranking.
    assert metrics["edge/recall@10"] > broken["edge/recall@10"] + 0.1, (metrics, broken)
