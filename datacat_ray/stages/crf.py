"""Linear-chain CRF decode: feature-template expansion → weight lookup →
Viterbi (SURVEY.md ST1/ST2).

Re-creates the *decode semantics* of the reference's Wapiti CRF taggers
(loaded once per parser singleton at ``DatacatSegmenterParser.java:83-85`` and
``DatacatBodySegmentationParser.java:63-67``, applied per document via
``label(features)``). The reference's segmenter weight file is a missing
git-LFS blob (``/root/reference/.MISSING_LARGE_BLOBS``), so exact weight reuse
is impossible; per SURVEY.md §7.0 this repo ships small frozen deterministic
models whose outputs define the golden byte-identity surface.

Feature templates follow the CRF++ template idea
(``resources/dataset/*/crfpp-templates/*.template``: ``U40:%x[-1,7]`` = value
of column 7 at relative row -1) but reference feature *names* instead of
positional columns: a template is ``(tag, [(row_offset, field), ...])`` and
expands at position t to the string ``"tag:v1|v2"``.

Determinism: Viterbi tie-breaks are stable (lowest label index wins — numpy
``argmax`` returns the first maximal index), so outputs are identical across
runs and parallelism levels (SURVEY.md §7.4 "CRF decode determinism").
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

NEG_INF = -1e9


@dataclass(frozen=True)
class CRFModel:
    """A frozen linear-chain CRF: label set, feature templates, sparse
    emission weights, dense transition matrix, initial-state scores."""

    labels: tuple[str, ...]
    templates: tuple[tuple[str, tuple[tuple[int, str], ...]], ...]
    weights: dict[str, dict[str, float]]
    transitions: dict[tuple[str, str], float]
    init: dict[str, float] = field(default_factory=dict)
    sticky: float = 0.0  # default self-transition bonus

    def label_index(self) -> dict[str, int]:
        return {lb: i for i, lb in enumerate(self.labels)}

    def transition_matrix(self) -> np.ndarray:
        L = len(self.labels)
        idx = self.label_index()
        T = np.zeros((L, L), dtype=np.float64)
        if self.sticky:
            T += np.eye(L) * self.sticky
        for (a, b), w in self.transitions.items():
            T[idx[a], idx[b]] += w
        return T

    def init_vector(self) -> np.ndarray:
        v = np.zeros(len(self.labels), dtype=np.float64)
        idx = self.label_index()
        for lb, w in self.init.items():
            v[idx[lb]] += w
        return v


def expand_templates(model: CRFModel, feats: list[dict]) -> list[list[str]]:
    """Per-position expanded feature strings. Out-of-range offsets expand
    with the boundary sentinel ``_B-1_`` / ``_B+1_`` (CRF++ convention)."""
    n = len(feats)
    out: list[list[str]] = []
    for t in range(n):
        fs: list[str] = []
        for tag, refs in model.templates:
            vals = []
            for off, name in refs:
                j = t + off
                if j < 0:
                    vals.append(f"_B{off}_")
                elif j >= n:
                    vals.append(f"_B+{off}_")
                else:
                    vals.append(str(feats[j][name]))
            fs.append(tag + ":" + "|".join(vals))
        out.append(fs)
    return out


_EMISSION_CACHE_MAX = 200_000


class CRFDecoder:
    """Decode-ready compiled form of a CRFModel (build once per actor)."""

    def __init__(self, model: CRFModel) -> None:
        self.model = model
        self.labels = list(model.labels)
        self.L = len(self.labels)
        self.idx = model.label_index()
        self.trans = model.transition_matrix()
        self.init = model.init_vector()
        # compile sparse weights to {feature_string: np.ndarray[L]}
        self.w: dict[str, np.ndarray] = {}
        for fstr, lw in model.weights.items():
            v = np.zeros(self.L, dtype=np.float64)
            for lb, wt in lw.items():
                v[self.idx[lb]] = wt
            self.w[fstr] = v
        # every (offset, field) any template references, in fixed order: the
        # emission row at position t is a pure function of these values, so
        # rows memoize on that value tuple (token patterns repeat heavily —
        # hit rates >90% on real corpora; cache capped and cleared at
        # _EMISSION_CACHE_MAX entries)
        self._refs = tuple(sorted(
            {(off, name) for _, refs in model.templates for off, name in refs}
        ))
        # rows cache as plain float LISTS and are ALIASED into every E
        # emissions() returns — consumers must never mutate a row in place
        self._ecache: dict[tuple, list[float]] = {}
        self._init_list = self.init.tolist()
        self._tcols = self.trans.T.tolist()  # _tcols[j][i] = trans[i, j]

    def _emission_row(self, feats: list[dict], t: int, n: int) -> np.ndarray:
        row = np.zeros(self.L, dtype=np.float64)
        lookup = self.w
        for tag, refs in self.model.templates:
            vals = []
            for off, name in refs:
                j = t + off
                if j < 0:
                    vals.append(f"_B{off}_")
                elif j >= n:
                    vals.append(f"_B+{off}_")
                else:
                    vals.append(str(feats[j][name]))
            v = lookup.get(tag + ":" + "|".join(vals))
            if v is not None:
                row += v
        return row

    def emissions(self, feats: list[dict]) -> list[list[float]]:
        """One emission row (plain float list, ready for the list-based
        Viterbi) per position. Rows are cached as LISTS: the only consumer
        is ``decode``, so materializing an (n, L) ndarray just to
        ``tolist()`` it back was pure overhead (profiled)."""
        n = len(feats)
        cache = self._ecache
        # column-wise key construction: one padded value list per (off,
        # name) ref (a tight listcomp + slice), then ``zip`` builds all n
        # key tuples in C — the per-position genexpr this replaces did
        # n×refs dict lookups through the interpreter loop (~7% of the
        # whole extraction kernel, profiled)
        cols = []
        by_name: dict[str, list] = {}
        for off, name in self._refs:
            vals = by_name.get(name)
            if vals is None:
                vals = by_name[name] = [f[name] for f in feats]
            if off < 0:
                cols.append(
                    [f"_B{off}_"] * min(-off, n) + vals[: max(n + off, 0)]
                )
            elif off > 0:
                cols.append(vals[off:] + [f"_B+{off}_"] * min(off, n))
            else:
                cols.append(vals)
        E: list[list[float]] = []
        # zero-ref models (e.g. a comments-only template file) produce no
        # columns; zip(*[]) would yield NOTHING, not n empty keys
        keys = zip(*cols) if cols else (() for _ in range(n))
        for t, key in enumerate(keys):
            row = cache.get(key)
            if row is None:
                if len(cache) >= _EMISSION_CACHE_MAX:
                    cache.clear()
                row = self._emission_row(feats, t, n).tolist()
                cache[key] = row
            E.append(row)
        return E

    def decode(self, feats: list[dict]) -> list[str]:
        """Viterbi with stable argmax tie-break (first maximal index wins);
        returns one label per position (no ``I-`` prefixes — run starts are
        derivable).

        Pure-Python list recursion, deliberately: with L=5–8 labels the
        per-step numpy dispatch overhead (3 kernel calls + allocations per
        position) costs more than the L² float ops themselves — measured
        ~2× slower than this loop. Arithmetic is the identical IEEE
        delta[i]+trans[i][j] adds in the same order, so outputs match the
        numpy formulation bit-for-bit."""
        n = len(feats)
        if n == 0:
            return []
        E = self.emissions(feats)
        L = self.L
        rng = range(L)
        # trans column-major: _tcols[j][i] = trans[i, j]
        tcols = self._tcols
        delta = [E[0][j] + self._init_list[j] for j in rng]
        backs: list[list[int]] = []
        for t in range(1, n):
            e = E[t]
            nd = [0.0] * L
            bk = [0] * L
            for j in rng:
                col = tcols[j]
                best_i = 0
                best = delta[0] + col[0]
                for i in range(1, L):
                    v = delta[i] + col[i]
                    if v > best:
                        best = v
                        best_i = i
                nd[j] = best + e[j]
                bk[j] = best_i
            delta = nd
            backs.append(bk)
        cur = max(rng, key=lambda j: (delta[j], -j))
        path = [cur]
        for bk in reversed(backs):
            cur = bk[cur]
            path.append(cur)
        path.reverse()
        return [self.labels[i] for i in path]


def parse_crfpp_template(
    text: str, field_names: list[str]
) -> tuple[tuple[str, tuple[tuple[int, str], ...]], ...]:
    """CRF++ template-file parser (SURVEY.md §2.9 feature-template surface;
    grammar of ``resources/dataset/*/crfpp-templates/*.template``):

    - ``U00:%x[-4,0]`` — unigram feature: tag ``U00``, value of column 0 at
      relative row -4; ``field_names[col]`` maps positional columns to this
      engine's named feature fields.
    - ``U0A:%x[-1,0]/%x[0,0]`` — conjunction of several refs.
    - ``#`` comments and blank lines skipped; a bare ``B`` line (bigram /
      transition marker) is skipped — transitions are dense in ``CRFModel``.

    CRF++ semantics kept faithfully, including the duplicate-tag collision
    foot-gun (the reference template reuses ``U00`` for different columns;
    expanded features collide exactly as they would in CRF++, because the
    feature id is ``tag:joined-values``)."""
    import re

    ref_re = re.compile(r"%x\[(-?\d+),(\d+)\]")
    out: list[tuple[str, tuple[tuple[int, str], ...]]] = []
    for raw in text.splitlines():
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        if line == "B":
            continue
        tag, _, body = line.partition(":")
        refs = tuple(
            (int(m.group(1)), field_names[int(m.group(2))])
            for m in ref_re.finditer(body)
        )
        if refs:
            out.append((tag, refs))
    return tuple(out)


def with_begin_prefix(labels: list[str]) -> list[str]:
    """Add the reference's ``I-`` begin prefix at run starts (the labeled
    sequence format consumed at ``DatacatSegmenterParser.java:864-952``)."""
    out: list[str] = []
    prev: str | None = None
    for lb in labels:
        out.append(f"I-{lb}" if lb != prev else lb)
        prev = lb
    return out


def strip_begin_prefix(label: str) -> str:
    return label[2:] if label.startswith("I-") else label
