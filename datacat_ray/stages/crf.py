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

    def emissions(self, feats: list[dict]) -> np.ndarray:
        n = len(feats)
        E = np.zeros((n, self.L), dtype=np.float64)
        lookup = self.w
        for t, fs in enumerate(expand_templates(self.model, feats)):
            row = E[t]
            for f in fs:
                v = lookup.get(f)
                if v is not None:
                    row += v
        return E

    def decode(self, feats: list[dict]) -> list[str]:
        """Viterbi with stable argmax tie-break; returns one label per
        position (no ``I-`` prefixes — run starts are derivable)."""
        n = len(feats)
        if n == 0:
            return []
        E = self.emissions(feats)
        delta = E[0] + self.init
        back = np.zeros((n, self.L), dtype=np.int32)
        for t in range(1, n):
            # scores[i, j] = delta[i] + trans[i, j]
            scores = delta[:, None] + self.trans
            back[t] = np.argmax(scores, axis=0)
            delta = scores[back[t], np.arange(self.L)] + E[t]
        path = np.zeros(n, dtype=np.int32)
        path[-1] = int(np.argmax(delta))
        for t in range(n - 1, 0, -1):
            path[t - 1] = back[t, path[t]]
        return [self.labels[i] for i in path]


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
