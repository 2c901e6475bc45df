"""L-BFGS/OWL-QN CRF trainer: gradient correctness (finite differences),
convergence on a separable task, L1 sparsity, determinism, and interop
with the dict-weight Viterbi decoder."""

from __future__ import annotations

import numpy as np
import pytest

from datacat_ray.stages.crf_train import (
    _pseudo_gradient,
    _seq_nll_grad,
    _shard_value_grad,
    _shard_value_grad_ref,
    index_sequences,
    to_dict_weights,
    train_crf_lbfgs,
)
from datacat_ray.stages.train import _viterbi


def _tiny_problem(rng, n=7, K=3, F=12, L=3):
    feats = rng.integers(0, F, size=(n, K)).astype(np.int32)
    gold = rng.integers(0, L, size=n).astype(np.int32)
    return feats, gold


def test_gradient_matches_finite_differences():
    rng = np.random.default_rng(7)
    F, L = 12, 3
    feats, gold = _tiny_problem(rng, F=F, L=L)
    x = rng.normal(scale=0.3, size=F * L + L * L)

    # FD needs a float64 objective (eps=1e-6 differences are below float32
    # resolution); dtype=float64 runs the SAME sparse kernel in double —
    # the float32 production default is pinned against this kernel in
    # test_batched_kernel_matches_logspace_reference
    from datacat_ray.stages.crf_train import ShardState

    st = ShardState([(feats, gold)], F, L, dtype=np.float64)
    _, g = st.value_grad(x, True)
    g = g.astype(np.float64)
    eps = 1e-6
    idxs = list(range(0, F * L + L * L, 5)) + [F * L + 1, F * L + L * L - 1]
    for i in idxs:
        xp, xm = x.copy(), x.copy()
        xp[i] += eps
        xm[i] -= eps
        fp, _ = st.value_grad(xp, False)
        fm, _ = st.value_grad(xm, False)
        num = (fp - fm) / (2 * eps)
        assert abs(num - g[i]) < 1e-4, (i, num, g[i])


def test_batched_kernel_matches_logspace_reference():
    """The hot batched scaled-FB kernel must agree with the per-sequence
    log-space implementation on a ragged multi-sequence shard."""
    rng = np.random.default_rng(11)
    F, L, K = 40, 5, 4
    shard = []
    for n in (1, 2, 9, 17, 17, 30):
        feats = rng.integers(0, F, size=(n, K)).astype(np.int32)
        gold = rng.integers(0, L, size=n).astype(np.int32)
        shard.append((feats, gold))
    x = rng.normal(scale=0.7, size=F * L + L * L)
    f_ref, g_ref = _shard_value_grad_ref(x, shard, F, L, True)
    # float64 state: exact agreement with the log-space reference
    from datacat_ray.stages.crf_train import ShardState

    st64 = ShardState(shard, F, L, dtype=np.float64)
    f64, g64 = st64.value_grad(x, True)
    assert f64 == pytest.approx(f_ref, rel=1e-10)
    np.testing.assert_allclose(
        g64.astype(np.float64), g_ref.astype(np.float64), atol=1e-3
    )
    # default (float32 hot buffers, float64 accumulators): the shipped
    # training kernel — agreement to float32 rounding
    f_new, g_new = _shard_value_grad(x, shard, F, L, True)
    assert f_new == pytest.approx(f_ref, rel=1e-5)
    np.testing.assert_allclose(
        g_new.astype(np.float64), g_ref.astype(np.float64), atol=2e-3
    )
    f_only, none = _shard_value_grad(x, shard, F, L, False)
    assert f_only == pytest.approx(f_ref, rel=1e-5) and none is None


def test_nll_is_proper_negative_log_prob():
    # single-position, single-feature: NLL must equal log-softmax form
    F, L = 2, 2
    W = np.array([[2.0, 0.0], [0.0, 0.0]])
    T = np.zeros((L, L))
    feats = np.array([[0]], dtype=np.int32)
    gold = np.array([0], dtype=np.int32)
    nll = _seq_nll_grad(W, T, feats, gold, None, None)
    expect = -np.log(np.exp(2.0) / (np.exp(2.0) + 1.0))
    assert abs(nll - expect) < 1e-12


def test_pseudo_gradient_kinks():
    x = np.array([1.0, -1.0, 0.0, 0.0, 0.0])
    g = np.array([0.1, 0.1, 2.0, -2.0, 0.1])
    pg = _pseudo_gradient(x, g, rho1=0.5)
    assert pg[0] == pytest.approx(0.6)   # x>0: g + rho1
    assert pg[1] == pytest.approx(-0.4)  # x<0: g - rho1
    assert pg[2] == pytest.approx(1.5)   # at 0, g-rho1 > 0
    assert pg[3] == pytest.approx(-1.5)  # at 0, g+rho1 < 0
    assert pg[4] == 0.0                  # inside the subgradient interval


def _toy_corpus():
    """Label == deterministic function of the observation, plus a
    transition-dependent case, so both W and T must be learned."""
    seqs = []
    pats = [
        (["a", "b", "a", "b", "c"], ["X", "Y", "X", "Y", "Z"]),
        (["b", "a", "c", "c", "a"], ["Y", "X", "Z", "Z", "X"]),
        (["c", "c", "b", "a", "a"], ["Z", "Z", "Y", "X", "X"]),
    ]
    for obs, gold in pats:
        fseq = [[f"u:{o}", f"p:{p}"] for o, p in
                zip(obs, ["_B_"] + obs[:-1])]
        seqs.append((fseq, gold))
    return seqs, ["X", "Y", "Z"]


def test_train_separable_to_perfect_accuracy(ray_session):
    seqs, labels = _toy_corpus()
    w, trans = train_crf_lbfgs(seqs, labels, rho1=0.0, rho2=1e-3,
                               max_iter=100, shards=2)
    for fseq, gold in seqs:
        assert _viterbi(fseq, labels, w, trans) == gold


def test_l1_yields_sparse_model_and_still_decodes(ray_session):
    seqs, labels = _toy_corpus()
    w_dense, _ = train_crf_lbfgs(seqs, labels, rho1=0.0, rho2=1e-3,
                                 max_iter=100, shards=1)
    w_sparse, trans = train_crf_lbfgs(seqs, labels, rho1=0.3, rho2=1e-4,
                                      max_iter=200, shards=1)
    n_dense = sum(len(lw) for lw in w_dense.values())
    n_sparse = sum(len(lw) for lw in w_sparse.values())
    assert n_sparse < n_dense
    for fseq, gold in seqs:
        assert _viterbi(fseq, labels, w_sparse, trans) == gold


def test_float64_mode_reachable_from_trainer_api(ray_session):
    """dtype threads train_crf_lbfgs -> CRFShardWorker -> ShardState, so
    the documented full-precision mode is reachable from the public API
    (not only by constructing ShardState directly). Both precisions must
    decode the separable corpus perfectly and agree closely on weights."""
    seqs, labels = _toy_corpus()
    w64, t64 = train_crf_lbfgs(seqs, labels, rho1=0.0, rho2=1e-3,
                               max_iter=100, shards=2, dtype="float64")
    w32, _ = train_crf_lbfgs(seqs, labels, rho1=0.0, rho2=1e-3,
                             max_iter=100, shards=2, dtype="float32")
    for fseq, gold in seqs:
        assert _viterbi(fseq, labels, w64, t64) == gold
    for lab in w32:
        for feat, v in w32[lab].items():
            assert abs(v - w64[lab].get(feat, 0.0)) < 1e-2


def test_determinism(ray_session):
    seqs, labels = _toy_corpus()
    a = train_crf_lbfgs(seqs, labels, rho1=0.1, max_iter=40, shards=2)
    b = train_crf_lbfgs(seqs, labels, rho1=0.1, max_iter=40, shards=2)
    assert a == b


def test_index_and_export_roundtrip():
    seqs, labels = _toy_corpus()
    indexed, vocab = index_sequences(seqs, labels)
    assert len(indexed) == len(seqs)
    assert indexed[0][0].shape == (5, 2)
    W = np.zeros((len(vocab), len(labels)))
    W[vocab.index("u:a"), 0] = 1.5
    T = np.zeros((3, 3))
    T[0, 1] = -0.25
    w, trans = to_dict_weights(W, T, vocab, labels)
    assert w == {"u:a": {"X": 1.5}}
    assert trans == {("X", "Y"): -0.25}


def test_checkpoint_resume(ray_session, tmp_path):
    """Long-run resumability: a checkpointed run continues from the saved
    iteration, converges, and refuses a mismatched corpus fingerprint."""
    seqs, labels = _toy_corpus()
    ck = str(tmp_path / "ck")
    # phase 1: 4 iterations, checkpoint every 2
    train_crf_lbfgs(seqs, labels, rho1=0.1, max_iter=4, shards=1,
                    checkpoint_dir=ck, checkpoint_every=2)
    import json
    import os

    meta = json.load(open(os.path.join(ck, "ckpt.json")))
    assert meta["iteration"] == 4
    # phase 2: resume to 60 — decodes the training data perfectly
    w, trans = train_crf_lbfgs(seqs, labels, rho1=0.1, max_iter=60, shards=1,
                               checkpoint_dir=ck, checkpoint_every=2)
    for fseq, gold in seqs:
        assert _viterbi(fseq, labels, w, trans) == gold
    meta = json.load(open(os.path.join(ck, "ckpt.json")))
    assert meta["iteration"] > 4
    # mismatched hyperparameters must refuse the checkpoint
    with pytest.raises(ValueError, match="different"):
        train_crf_lbfgs(seqs, labels, rho1=0.3, max_iter=4, shards=1,
                        checkpoint_dir=ck)


def test_checkpoint_single_commit_point(ray_session, tmp_path):
    """r4 (ADVICE): the json replace is the one atomic publish. A crash
    between the x write and the json write must leave the PREVIOUS
    (x, meta) pair fully consistent — never a new parameter vector paired
    with a stale iteration/objective tail."""
    import json
    import os

    seqs, labels = _toy_corpus()
    ck = str(tmp_path / "ck")
    train_crf_lbfgs(seqs, labels, rho1=0.1, max_iter=4, shards=1,
                    checkpoint_dir=ck, checkpoint_every=2)
    meta = json.load(open(os.path.join(ck, "ckpt.json")))
    committed = meta["x_file"]
    x_committed = np.load(os.path.join(ck, committed))

    # simulate the torn state: a NEWER x landed but the json never did
    np.save(os.path.join(ck, "x-999999.npy"),
            x_committed + 1.0)

    from datacat_ray.stages.crf_train import _Checkpoint

    loaded = _Checkpoint(ck, meta["fingerprint"], 2).load(x_committed.shape[0])
    assert loaded is not None
    x, m = loaded
    assert m["iteration"] == meta["iteration"]
    np.testing.assert_array_equal(x, x_committed)  # stale orphan ignored

    # superseded vectors are GC'd on the next committed save
    train_crf_lbfgs(seqs, labels, rho1=0.1, max_iter=8, shards=1,
                    checkpoint_dir=ck, checkpoint_every=2)
    meta2 = json.load(open(os.path.join(ck, "ckpt.json")))
    npys = [f for f in os.listdir(ck) if f.endswith(".npy")]
    assert npys == [meta2["x_file"]]
