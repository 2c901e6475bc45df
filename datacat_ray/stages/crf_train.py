"""L-BFGS / OWL-QN linear-chain CRF training — the reference's actual
estimator family.

The reference trains elastic-net-penalized CRFs with Wapiti's l-bfgs
trainer (``DatacatSegmenterTrainer.java:25-247`` wires window / epsilon /
max-iterations from ``resources/config/grobid-datacat.yaml:17-20`` into
Wapiti); the engine's earlier estimator was an averaged structured
perceptron (``stages/train.py``), which reproduces the *capability* but
not the estimator. This module closes that gap with the same objective:
conditional log-likelihood (Lafferty et al. 2001) with an elastic-net
penalty, maximized by OWL-QN (Andrew & Gao 2007) — plain L-BFGS (Nocedal &
Wright, ch. 7) when ``rho1 == 0``. Pure numpy; no Wapiti code read or
copied; Wapiti's default penalties (rho1=0.5, rho2=1e-4) are its
documented CLI defaults.

Distributed shape: the full-batch gradient is a sum of per-sequence
gradients, so each evaluation fans the indexed corpus shards out as Ray
tasks (shards shipped to the object store ONCE; only the O(F*L) weight
vector moves per iteration) and the driver folds the partial gradients.
The optimizer state itself is tiny (m (s, y) history pairs). This is the
textbook data-parallel batch-CRF layout — at web scale the same shape runs
with one task per partition of the training table.

Determinism: shard assignment, reduction order, and every numpy op are
fixed, so a (seqs, labels, hyperparams) tuple always yields identical
weights bit-for-bit at a fixed shard count.
"""

from __future__ import annotations

import numpy as np
import ray


# ---------------------------------------------------------------------------
# corpus indexing


def index_sequences(
    seqs: list[tuple[list[list[str]], list[str]]],
    labels: list[str],
) -> tuple[list[tuple[np.ndarray, np.ndarray]], list[str]]:
    """Map expanded feature strings / gold labels to int32 arrays.

    Every position carries exactly K = n_templates features (one expansion
    per template line — ``train.expand_sequence`` guarantees this), so a
    sequence indexes as a dense ``feats[n, K]`` matrix plus ``gold[n]``.
    Returns (indexed sequences, feature vocabulary) — vocabulary order is
    first-occurrence, hence deterministic for a fixed corpus order.
    """
    lab_idx = {lb: i for i, lb in enumerate(labels)}
    vocab: dict[str, int] = {}
    out = []
    for fseq, gold in seqs:
        if not fseq:
            continue
        k = len(fseq[0])
        feats = np.empty((len(fseq), k), dtype=np.int32)
        for t, fs in enumerate(fseq):
            for j, f in enumerate(fs):
                idx = vocab.get(f)
                if idx is None:
                    idx = len(vocab)
                    vocab[f] = idx
                feats[t, j] = idx
        g = np.array([lab_idx[x] for x in gold], dtype=np.int32)
        out.append((feats, g))
    return out, list(vocab)


# ---------------------------------------------------------------------------
# NLL + gradient (one shard)


def _logsumexp(a: np.ndarray, axis: int) -> np.ndarray:
    m = a.max(axis=axis, keepdims=True)
    return (m + np.log(np.exp(a - m).sum(axis=axis, keepdims=True))).squeeze(axis)


def _seq_nll_grad(
    W: np.ndarray,
    T: np.ndarray,
    feats: np.ndarray,
    gold: np.ndarray,
    gW: np.ndarray | None,
    gT: np.ndarray | None,
) -> float:
    """Negative conditional log-likelihood of one sequence; if gradient
    buffers are given, accumulate d NLL / d params into them (expected
    feature counts minus empirical — forward-backward marginals)."""
    n, K = feats.shape
    L = T.shape[0]
    E = W[feats.ravel()].reshape(n, K, L).sum(axis=1)  # emission scores [n, L]

    # forward (log-alpha)
    la = np.empty((n, L))
    la[0] = E[0]
    for t in range(1, n):
        M = la[t - 1][:, None] + T
        m = M.max(axis=0)
        la[t] = m + np.log(np.exp(M - m).sum(axis=0)) + E[t]
    log_z = _logsumexp(la[-1], axis=0)

    ts = np.arange(n)
    score = E[ts, gold].sum() + (T[gold[:-1], gold[1:]].sum() if n > 1 else 0.0)
    nll = float(log_z - score)
    if gW is None:
        return nll

    # backward (log-beta) + pairwise expectations folded into gT
    lb = np.zeros(L)
    for t in range(n - 1, 0, -1):
        add = E[t] + lb  # [L]
        M = la[t - 1][:, None] + T + add[None, :] - log_z
        gT += np.exp(M)
        m = (T + add[None, :]).max(axis=1)
        lb = m + np.log(np.exp(T + add[None, :] - m[:, None]).sum(axis=1))
    if n > 1:
        np.add.at(gT, (gold[:-1], gold[1:]), -1.0)

    # unigram marginals -> emission-feature gradient
    lbs = np.empty((n, L))
    lbs[-1] = 0.0
    lb = np.zeros(L)
    for t in range(n - 2, -1, -1):
        add = E[t + 1] + lb
        m = (T + add[None, :]).max(axis=1)
        lb = m + np.log(np.exp(T + add[None, :] - m[:, None]).sum(axis=1))
        lbs[t] = lb
    post = np.exp(la + lbs - log_z)  # [n, L]
    post[ts, gold] -= 1.0
    flat = feats.ravel()
    for l in range(L):
        gW[:, l] += np.bincount(
            flat, weights=np.repeat(post[:, l], K), minlength=gW.shape[0]
        )
    return nll


def _shard_value_grad_ref(
    x: np.ndarray,
    shard: list[tuple[np.ndarray, np.ndarray]],
    n_feat: int,
    n_lab: int,
    want_grad: bool,
) -> tuple[float, np.ndarray | None]:
    """Reference implementation (log-space, one sequence at a time) — kept
    for the finite-difference and batched-parity tests; the hot path is
    ``_shard_value_grad``."""
    W = x[: n_feat * n_lab].reshape(n_feat, n_lab)
    T = x[n_feat * n_lab:].reshape(n_lab, n_lab)
    gW = np.zeros_like(W) if want_grad else None
    gT = np.zeros_like(T) if want_grad else None
    nll = 0.0
    for feats, gold in shard:
        nll += _seq_nll_grad(W, T, feats, gold, gW, gT)
    if not want_grad:
        return nll, None
    return nll, np.concatenate([gW.ravel(), gT.ravel()]).astype(np.float32)


class ShardState:
    """Batched scaled forward-backward over one training shard, with every
    shard-static array precomputed and every large buffer preallocated.

    Batched: all sequences in the shard advance TOGETHER through one
    padded time loop (Rabiner-style scaling constants instead of
    log-space), so the per-step Python cost is one set of [S, L] numpy
    ops for the whole shard rather than per-token calls per sequence.
    Preallocated: the [S, N, L] tensors, the emission matrix, and the
    gradient rows are built once and refilled per call — fresh
    allocations re-fault hundreds of MB of pages per evaluation, which
    measured ~10× slower when many shards run concurrently.

    Scale shape (the r3 "bandwidth wall" fix): per evaluation a shard
    touches ONLY its own distinct features (``uniq``) — the weight gather
    reads a shard-local ``Wu = W[uniq]`` table (cache-resident; the old
    path random-gathered rows of the full n_feat×L matrix) and the
    gradient comes back SPARSE as (uniq, rows) via one sorted
    ``reduceat`` per label (the old per-label ``bincount`` wrote an
    n_feat-wide output per label per shard per eval — O(dim) work per
    worker that made extra workers useless). Hot buffers are ``dtype``
    (float32 by default — halves every stream; objective/score terms
    still accumulate in float64, and the gradient segment sums reduce in
    float64, so FD checks stay green); pass float64 to reproduce the
    log-space reference to full precision.
    """

    def __init__(self, shard, n_feat: int, n_lab: int, dtype=np.float32):
        self.n_feat, self.L = n_feat, n_lab
        self.dtype = dtype
        order = sorted(range(len(shard)), key=lambda i: -len(shard[i][1]))
        seqs = [shard[i] for i in order]
        self.empty = not seqs
        self.dim = n_feat * n_lab + n_lab * n_lab
        if self.empty:
            return
        L = n_lab
        lens = np.array([len(g) for _, g in seqs], dtype=np.int64)
        S, N = len(seqs), int(lens[0])
        self.lens, self.S, self.N = lens, S, N
        self.K = K = seqs[0][0].shape[1]
        flat = np.concatenate([f.ravel() for f, _ in seqs])
        self.total = total = int(lens.sum())
        # shard-local feature ids: every eval touches only these rows of W
        self.uniq = np.unique(flat)
        self.flat_inv = np.searchsorted(self.uniq, flat).astype(np.int32)
        # sorted-segment layout for the sparse gradient: instance e of
        # feature uniq[j] lives at position g_pos[...] in the shard
        g_order = np.argsort(self.flat_inv, kind="stable")
        self.g_pos = (g_order // K).astype(np.int64)
        counts = np.bincount(self.flat_inv, minlength=len(self.uniq))
        starts = np.zeros(len(self.uniq), dtype=np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        self.g_starts = starts
        offs = np.zeros(S + 1, dtype=np.int64)
        np.cumsum(lens, out=offs[1:])
        self.offs = offs
        self.gold_cat = np.concatenate([g for _, g in seqs])
        self.gold_rows = np.arange(total)
        # empirical transition counts (constant across evaluations)
        self.emp_trans = np.zeros((L, L))
        longs = [g for _, g in seqs if len(g) > 1]
        ti = (np.concatenate([g[:-1] for g in longs]) if longs
              else np.empty(0, dtype=np.int64))
        tj = (np.concatenate([g[1:] for g in longs]) if longs
              else np.empty(0, dtype=np.int64))
        np.add.at(self.emp_trans, (ti, tj), 1.0)
        self.t_i, self.t_j = ti, tj
        # per-step active masks, precomputed ([N, S] bools)
        self.active = lens[None, :] > np.arange(N)[:, None]
        # warm buffers (dtype: float32 halves every bandwidth-bound stream)
        self.Ecat = np.empty((total, L), dtype=dtype)
        self.Ee = np.ones((S, N, L), dtype=dtype)
        self.A = np.empty((S, N, L), dtype=dtype)
        self.C = np.ones((S, N), dtype=dtype)
        self.gamma = np.empty((S, N, L), dtype=dtype)
        self.rows = np.empty((len(self.uniq), L), dtype=np.float32)
        self.seg64 = np.empty(total * K)  # float64 reduceat input

    def value_grad_sparse(
        self, x: np.ndarray, want_grad: bool
    ) -> tuple[float, np.ndarray | None, np.ndarray | None, np.ndarray | None]:
        """(nll, uniq, gW_rows, gT): the gradient restricted to this
        shard's features — O(shard) bytes, never O(dim)."""
        n_feat, L = self.n_feat, self.L
        if self.empty:
            return 0.0, None, None, None
        dt = self.dtype
        W = x[: n_feat * L].reshape(n_feat, L)
        T = x[n_feat * L:].reshape(L, L)
        m_t = float(T.max())
        expT = np.exp(T - m_t).astype(dt)
        S, N, K, total = self.S, self.N, self.K, self.total
        lens, offs, flat_inv = self.lens, self.offs, self.flat_inv
        Ecat, Ee, A, C = self.Ecat, self.Ee, self.A, self.C

        # shard-local weight table: u random reads of W ONCE per eval,
        # then every emission gather hits the compact (cache-sized) Wu
        Wu = W[self.uniq].astype(dt)
        chunk = max(1, (1 << 21) // (K * L))  # intermediate ~2M elements
        for c0 in range(0, total, chunk):
            c1 = min(total, c0 + chunk)
            Ecat[c0:c1] = (
                Wu.take(flat_inv[c0 * K: c1 * K], axis=0)
                .reshape(c1 - c0, K, L)
                .sum(axis=1)
            )
        m_e = Ecat.max(axis=1)  # per-position emission row max
        for s in range(S):
            seg = Ecat[offs[s]: offs[s + 1]]
            np.exp(seg - m_e[offs[s]: offs[s + 1], None], out=Ee[s, : lens[s]])

        v = Ee[:, 0].copy()
        c = v.sum(axis=1)
        A[:, 0] = v / c[:, None]
        C[:, 0] = c
        for t in range(1, N):
            active = self.active[t]
            v = (A[:, t - 1] @ expT) * Ee[:, t]
            c = v.sum(axis=1)
            safe = np.where(active, c, 1.0)
            A[:, t] = np.where(active[:, None], v / safe[:, None], A[:, t - 1])
            C[:, t] = safe

        # objective terms accumulate in float64 whatever the buffer dtype
        log_z = np.log(C, dtype=np.float64).sum(axis=1) + (lens - 1) * m_t
        log_z_sum = float(log_z.sum() + m_e.sum(dtype=np.float64))
        score = float(
            Ecat[self.gold_rows, self.gold_cat].sum(dtype=np.float64)
            + T[self.t_i, self.t_j].sum()
        )
        nll = log_z_sum - score
        if not want_grad:
            return nll, None, None, None

        gamma = self.gamma
        gT = -self.emp_trans.copy()  # expected minus empirical (float64)
        b = np.ones((S, L), dtype=dt)
        gamma[:, N - 1] = A[:, N - 1]
        for t in range(N - 1, 0, -1):
            active = self.active[t]
            w_t = Ee[:, t] * b / C[:, t][:, None]       # [S, L]
            aw = np.where(active[:, None], A[:, t - 1], 0.0)
            gT += (aw.T @ w_t) * expT                   # batched pairwise sums
            b_new = w_t @ expT.T
            b = np.where(active[:, None], b_new, b)
            np.multiply(A[:, t - 1], b, out=gamma[:, t - 1])

        # emission gradient: expected - empirical, scattered once per shard
        dcat = Ecat  # reuse the emission buffer for the deltas
        for s in range(S):
            dcat[offs[s]: offs[s + 1]] = gamma[s, : lens[s]]
        dcat[self.gold_rows, self.gold_cat] -= 1.0
        # sparse rows: one float64 segment-sum per label over the sorted
        # feature-instance layout (cache-resident gather source)
        rows = self.rows
        seg = self.seg64
        for l in range(L):
            seg[:] = dcat[:, l][self.g_pos]
            rows[:, l] = np.add.reduceat(seg, self.g_starts)
        return nll, self.uniq, rows, gT

    def value_grad(
        self, x: np.ndarray, want_grad: bool
    ) -> tuple[float, np.ndarray | None]:
        """Dense-gradient wrapper (tests / single-process callers)."""
        nll, uniq, rows, gT = self.value_grad_sparse(x, want_grad)
        if not want_grad:
            return nll, None
        n_feat, L = self.n_feat, self.L
        out = np.zeros(self.dim, dtype=np.float32)
        if uniq is not None:
            gW = out[: n_feat * L].reshape(n_feat, L)
            gW[uniq] = rows
            out[n_feat * L:] = gT.ravel().astype(np.float32)
        return nll, out


def _shard_value_grad(
    x: np.ndarray,
    shard: list[tuple[np.ndarray, np.ndarray]],
    n_feat: int,
    n_lab: int,
    want_grad: bool,
) -> tuple[float, np.ndarray | None]:
    """One-shot wrapper over ``ShardState`` (tests / ad-hoc callers; the
    training loop holds a warm ``ShardState`` per actor instead)."""
    g = ShardState(shard, n_feat, n_lab).value_grad(x, want_grad)
    return g[0], (None if g[1] is None else g[1].copy())


@ray.remote
class CRFShardWorker:
    """One training shard pinned in an actor (the repo's standard stateful
    stage shape: state in ``__init__``, work per call) — holds a warm
    ``ShardState`` so per-iteration cost is pure compute. Gradients leave
    the actor SPARSE ((uniq, rows, gT), O(shard features) bytes) — the
    dense O(dim) per-worker return was the r3 bandwidth wall: at dim 7.5M
    every worker shipped a 30 MB vector per iteration and the driver
    folded shards×dim serially."""

    def __init__(self, shard, n_feat: int, n_lab: int, dtype: str = "float32"):
        # dtype crosses the actor boundary as a string (np dtype objects
        # serialize fine, but the string form keeps the remote signature
        # trivially picklable and log-readable)
        self._state = ShardState(shard, n_feat, n_lab, dtype=np.dtype(dtype))

    def value_grad(self, x: np.ndarray, want_grad: bool):
        return self._state.value_grad_sparse(x, want_grad)


# ---------------------------------------------------------------------------
# OWL-QN driver


def _pseudo_gradient(x: np.ndarray, g: np.ndarray, rho1: float) -> np.ndarray:
    """Orthant-wise pseudo-gradient of f(x) + rho1*|x|_1 (Andrew & Gao
    2007, eq. 4): the usual subgradient choice that is zero exactly when
    no descent direction exists at a kink."""
    if rho1 == 0.0:
        return g
    pg = np.where(x > 0, g + rho1, np.where(x < 0, g - rho1, 0.0))
    at0 = x == 0
    lo = g[at0] + rho1
    hi = g[at0] - rho1
    pg0 = np.where(hi > 0, hi, np.where(lo < 0, lo, 0.0))
    pg[at0] = pg0
    return pg


def train_crf_lbfgs(
    seqs: list[tuple[list[list[str]], list[str]]],
    labels: list[str],
    rho1: float = 0.5,
    rho2: float = 1e-4,
    epsilon: float = 1e-7,
    window: int = 5,
    max_iter: int = 1000,
    history: int = 5,
    shards: int = 8,
    verbose: bool = False,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 10,
    dtype: str = "float32",
) -> tuple[dict, dict]:
    """Train a linear-chain CRF by OWL-QN (L-BFGS when ``rho1 == 0``).

    Hyperparameter names follow the reference's training config
    (``grobid-datacat.yaml:17-20``): ``epsilon`` + ``window`` give Wapiti's
    stopping rule — relative objective change over the last ``window``
    iterations below ``epsilon`` — and ``max_iter`` caps iterations;
    ``rho1``/``rho2`` are the elastic-net penalties (Wapiti CLI defaults).

    Returns (weights, transitions) in the same dict form as
    ``train._train_shard``, consumable by ``train._viterbi`` /
    ``crf.CRFModel``; L1 zeros are dropped, so ``rho1 > 0`` yields a
    genuinely sparse model.

    ``checkpoint_dir`` makes long runs resumable (the repo's manifest
    convention: write-temp-rename, resume = read the checkpoint): every
    ``checkpoint_every`` accepted iterations the parameter vector and
    iteration counter are published atomically; a rerun with the same
    ``checkpoint_dir`` continues from there (with EMPTY curvature
    history — the next few steps are gradient-scaled, so the resumed
    trajectory is equivalent but not bit-identical to an uninterrupted
    run; the checkpoint stores a corpus/hyperparameter fingerprint and
    refuses to resume across a mismatch).

    ``dtype`` sets the shard hot-buffer precision (``"float32"`` default —
    halves every bandwidth-bound stream; ``"float64"`` reproduces the
    log-space reference to full precision, see ``ShardState``). Objective
    terms accumulate in float64 either way.
    """
    indexed, vocab = index_sequences(seqs, labels)
    n_feat, n_lab = len(vocab), len(labels)
    dim = n_feat * n_lab + n_lab * n_lab
    shards = max(1, min(shards, len(indexed)))
    # round-robin over a length-sorted order: balances shard wall-time
    order = sorted(range(len(indexed)), key=lambda i: (-len(indexed[i][1]), i))
    workers = [
        CRFShardWorker.remote([indexed[i] for i in order[s::shards]],
                              n_feat, n_lab, dtype)
        for s in range(shards)
    ]
    ckpt = None
    if checkpoint_dir is not None:
        fp_src = repr((sorted(vocab[:1000]), n_feat, n_lab, rho1, rho2,
                       epsilon, window, history, shards,
                       sum(len(g) for _, g in indexed), dtype))
        import hashlib as _hl
        ckpt = _Checkpoint(checkpoint_dir,
                           _hl.sha256(fp_src.encode()).hexdigest()[:16],
                           checkpoint_every)
    try:
        return _optimize(workers, vocab, labels, dim, n_feat, n_lab, rho1,
                         rho2, epsilon, window, max_iter, history, verbose,
                         ckpt)
    finally:
        for wk in workers:
            ray.kill(wk)


class _Checkpoint:
    """Atomic parameter checkpoint for the training loop (state =
    x vector + iteration count + objective history tail)."""

    def __init__(self, dir: str, fingerprint: str, every: int) -> None:
        import os
        self.dir, self.fp, self.every = dir, fingerprint, every
        os.makedirs(dir, exist_ok=True)

    def load(self, dim: int):
        import json as _json
        import os
        meta_p = os.path.join(self.dir, "ckpt.json")
        if not os.path.exists(meta_p):
            return None
        with open(meta_p, encoding="utf-8") as fh:
            meta = _json.load(fh)
        if meta.get("fingerprint") != self.fp:
            raise ValueError(
                f"checkpoint in {self.dir} was written by a different "
                "corpus/hyperparameter combination; use a fresh dir")
        # the json names its x file ("x.npy" = pre-versioning layout), so
        # meta and parameters can never be mismatched halves of two saves
        x_p = os.path.join(self.dir, meta.get("x_file", "x.npy"))
        if not os.path.exists(x_p):
            return None
        x = np.load(x_p)
        if x.shape[0] != dim:
            raise ValueError("checkpoint dimension mismatch")
        return x, meta

    def save(self, x: np.ndarray, it: int, obj_hist: list,
             step_prev) -> None:
        """One commit point: the x vector lands under a VERSIONED name
        recorded inside ckpt.json, and the json os.replace is the single
        atomic publish — a crash between the two writes leaves the
        previous (x, meta) pair fully consistent (the old two-replace
        scheme could pair a new x with a stale iteration/objective tail
        and mis-evaluate the windowed stopping rule on resume)."""
        import json as _json
        import os
        x_name = f"x-{it:06d}.npy"
        tmp = os.path.join(self.dir, f".tmp.x.{os.getpid()}.npy")
        np.save(tmp, x)
        os.replace(tmp, os.path.join(self.dir, x_name))
        meta = {"fingerprint": self.fp, "iteration": it,
                "obj_hist_tail": obj_hist[-8:], "step_prev": step_prev,
                "x_file": x_name}
        tmp = os.path.join(self.dir, f".tmp.ckpt.{os.getpid()}.json")
        with open(tmp, "w", encoding="utf-8") as fh:
            _json.dump(meta, fh)
        os.replace(tmp, os.path.join(self.dir, "ckpt.json"))
        for f in os.listdir(self.dir):  # GC superseded parameter vectors
            if f.startswith("x") and f.endswith(".npy") and f != x_name:
                try:
                    os.remove(os.path.join(self.dir, f))
                except OSError:
                    pass


def _optimize(workers, vocab, labels, dim, n_feat, n_lab, rho1, rho2,
              epsilon, window, max_iter, history, verbose, ckpt=None):
    import time as _time

    n_evals = [0]

    def evaluate(x: np.ndarray, want_grad: bool) -> tuple[float, np.ndarray | None]:
        n_evals[0] += 1
        xref = ray.put(x)
        parts = ray.get([
            wk.value_grad.remote(xref, want_grad) for wk in workers
        ])
        nll = sum(p[0] for p in parts)
        f = nll + 0.5 * rho2 * float(x @ x)
        if not want_grad:
            return f, None
        # sparse scatter-add fold, fixed order: O(Σ shard features), not
        # O(shards × dim) — each worker's uniq rows are disjoint within
        # itself, so fancy-index += is exact
        g = np.zeros(dim)
        gW = g[: n_feat * n_lab].reshape(n_feat, n_lab)
        gT = g[n_feat * n_lab:].reshape(n_lab, n_lab)
        for p in parts:
            if p[1] is not None:
                gW[p[1]] += p[2]
                gT += p[3]
        g += rho2 * x
        return f, g

    def phi(f_smooth: float, x: np.ndarray) -> float:
        return f_smooth + rho1 * float(np.abs(x).sum())

    t_start = _time.time()
    x = np.zeros(dim)
    it0 = 0
    step_prev = None
    obj_tail: list = []
    if ckpt is not None:
        loaded = ckpt.load(dim)
        if loaded is not None:
            x, meta = loaded
            it0 = int(meta["iteration"])
            step_prev = meta.get("step_prev")
            obj_tail = list(meta.get("obj_hist_tail", []))
            if verbose:
                print(f"[owlqn] resumed from iteration {it0}", flush=True)
    f, g = evaluate(x, True)
    obj = phi(f, x)
    s_hist: list[np.ndarray] = []
    y_hist: list[np.ndarray] = []
    obj_hist = obj_tail + [obj]
    for it in range(it0, max_iter):
        pg = _pseudo_gradient(x, g, rho1)
        if not np.any(pg):
            break
        # two-loop recursion on the smooth-gradient history
        d = -pg
        alphas = []
        for s, y in zip(reversed(s_hist), reversed(y_hist)):
            a = (s @ d) / (y @ s)
            alphas.append(a)
            d = d - a * y
        if y_hist:
            y = y_hist[-1]
            d = d * ((s_hist[-1] @ y) / (y @ y))
        for (s, y), a in zip(zip(s_hist, y_hist), reversed(alphas)):
            b = (y @ d) / (y @ s)
            d = d + (a - b) * s
        if rho1 > 0.0:
            # align with the steepest-descent orthant (Andrew & Gao alg. 2,
            # π(d; -pg)): zero every component whose sign disagrees with
            # -pg — INCLUDING pg_i == 0 components (|g_i| <= rho1 at a
            # kink), which are pinned this iteration; letting them drift
            # makes millions of coordinates oscillate on/off zero
            d[d * pg >= 0] = 0.0
        # orthant for the line search: sign(x), or -sign(pg) at zeros
        xi = np.sign(x)
        z = xi == 0
        xi[z] = -np.sign(pg[z])
        # step memory: start near the last accepted step (doubling back
        # toward 1, floored at 1/4 so the tiny first-iteration
        # gradient-descent step can never trap the search) — with
        # L1-projected directions the unit step fails systematically on
        # this objective, and every failed first trial wastes the fused
        # gradient plus one extra distributed eval
        if not s_hist:
            step = 1.0 / max(1e-12, float(np.linalg.norm(d)))
        elif step_prev is not None:
            step = min(1.0, max(step_prev * 2.0, 0.25))
        else:
            step = 1.0
        accepted = False
        for trial in range(30):
            x_new = x + step * d
            if rho1 > 0.0:
                # π(x; ξ): zero wherever the point leaves the orthant —
                # sign mismatch OR a ξ_i == 0 coordinate trying to move
                x_new[np.sign(x_new) != xi] = 0.0
            # fused line search: the first trial is accepted almost always
            # once curvature history exists, so compute its gradient in the
            # same distributed pass and reuse it on acceptance (one eval
            # per iteration instead of two); retries fall back to
            # value-only evaluations
            f_new, g_new = evaluate(x_new, trial == 0)
            obj_new = phi(f_new, x_new)
            if obj_new <= obj + 1e-4 * float(pg @ (x_new - x)):
                accepted = True
                break
            step *= 0.5
        if not accepted:
            break
        step_prev = step
        if g_new is None:
            f_new, g_new = evaluate(x_new, True)
        s_vec, y_vec = x_new - x, g_new - g
        if float(y_vec @ s_vec) > 1e-10:
            s_hist.append(s_vec)
            y_hist.append(y_vec)
            if len(s_hist) > history:
                s_hist.pop(0)
                y_hist.pop(0)
        x, g, obj = x_new, g_new, phi(f_new, x_new)
        obj_hist.append(obj)
        if verbose:
            nnz = int(np.count_nonzero(x))
            print(f"[owlqn] it={it + 1} obj={obj:.4f} nnz={nnz}/{dim} "
                  f"evals={n_evals[0]} t={_time.time() - t_start:.0f}s",
                  flush=True)
        if ckpt is not None and (it + 1) % ckpt.every == 0:
            ckpt.save(x, it + 1, obj_hist, step_prev)
        # Wapiti-style windowed relative-improvement stop
        if len(obj_hist) > window:
            prev = obj_hist[-window - 1]
            if abs(prev - obj) / max(abs(obj), 1e-12) < epsilon:
                break

    W = x[: n_feat * n_lab].reshape(n_feat, n_lab)
    T = x[n_feat * n_lab:].reshape(n_lab, n_lab)
    return to_dict_weights(W, T, vocab, labels)


def to_dict_weights(
    W: np.ndarray,
    T: np.ndarray,
    vocab: list[str],
    labels: list[str],
    tol: float = 1e-10,
) -> tuple[dict, dict]:
    """Matrix params -> the engine's dict (weights, transitions) form
    (``train._viterbi`` / ``crf.CRFModel`` input); exact zeros from the L1
    penalty are dropped."""
    w: dict[str, dict[str, float]] = {}
    rows = np.nonzero(np.abs(W).max(axis=1) > tol)[0]
    for r in rows:
        lw = {
            labels[l]: float(W[r, l])
            for l in range(len(labels))
            if abs(W[r, l]) > tol
        }
        if lw:
            w[vocab[r]] = lw
    trans = {
        (labels[i], labels[j]): float(T[i, j])
        for i in range(len(labels))
        for j in range(len(labels))
        if abs(T[i, j]) > tol
    }
    return w, trans
