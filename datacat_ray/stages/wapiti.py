"""Wapiti CRF model reader + Viterbi decoder (weight-level parity path).

The reference ships a real trained body-segmentation model at
``resources/models/datacat-body-segmentation/model.wapiti`` and loads it
through the Wapiti JNI wrapper (``DatacatBodySegmentationParser.java:63-67``).
Wapiti's model format is public (https://wapiti.limsi.fr, BSD): a text file

    #mdl#<type>#<nactive>
    #rdr#<npats>/<ntoks>/<autouni>
    <npats length-prefixed pattern lines "len:str,">
    #qrk#<nlbl> + label dictionary (same length-prefixed lines)
    #qrk#<nobs> + observation dictionary
    <id>=<C99 hex float> weight lines (only nonzero weights)

Feature layout (Wapiti model.c ``mdl_sync``): observations are scanned in
id order; an obs whose string starts 'u' owns Y unigram weights at its
offset, 'b' owns Y² bigram weights, '*' both — so feature id
``uoff[o]+y`` / ``boff[o]+y'·Y+y``. Patterns are CRF++-style ``%x[r,c]``
windows; out-of-range rows read as the ``_x%+d`` boundary markers.

This module re-implements READING and DECODING only (no Wapiti code is
copied — the format is reverse-readable from the spec and the file
itself); decoding runs inside the engine's own batch stages, one model
parse per worker.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np

_PX_RE = re.compile(r"%([xXtTmM])\[(-?\d+),(\d+)(?:,[^\]]*)?\]")


@dataclass
class WapitiModel:
    mtype: int
    patterns: list[list]  # compiled segment lists
    labels: list[str]
    obs_ids: dict[str, int]
    kind: np.ndarray  # per obs: 1 unigram, 2 bigram, 3 both
    uoff: np.ndarray
    boff: np.ndarray
    theta: np.ndarray  # dense feature weights

    @property
    def n_labels(self) -> int:
        return len(self.labels)


def _read_qrk(lines: list[str], i: int) -> tuple[list[str], int]:
    """Parse one ``#qrk#N`` dictionary. Entries are ``len:str,`` — the
    LENGTH must be used (strings may contain ':' and ',')."""
    n = int(lines[i].rsplit("#", 1)[1])
    out = []
    for j in range(i + 1, i + 1 + n):
        ln = lines[j]
        c = ln.index(":")
        ln_len = int(ln[:c])
        out.append(ln[c + 1 : c + 1 + ln_len])
    return out, i + 1 + n


def _compile_pattern(pat: str) -> list:
    """Pattern → segments: literal strings and ('x', row, col) window
    refs (uppercase %X lowercases the token, Wapiti semantics)."""
    segs: list = []
    pos = 0
    for m in _PX_RE.finditer(pat):
        if m.start() > pos:
            segs.append(pat[pos : m.start()])
        cmd = m.group(1)
        if cmd not in ("x", "X"):
            raise ValueError(f"unsupported wapiti pattern command %{cmd}")
        segs.append((cmd, int(m.group(2)), int(m.group(3))))
        pos = m.end()
    if pos < len(pat):
        segs.append(pat[pos:])
    return segs


def parse_wapiti_model(text: str) -> WapitiModel:
    lines = text.split("\n")
    _, mtype, _nact = lines[0].split("#")[1:4]
    npats = int(lines[1].split("#")[2].split("/")[0])
    pats_raw = []
    for j in range(2, 2 + npats):
        ln = lines[j]
        c = ln.index(":")
        pats_raw.append(ln[c + 1 : c + 1 + int(ln[:c])])
    labels, i = _read_qrk(lines, 2 + npats)
    obs, i = _read_qrk(lines, i)

    Y = len(labels)
    kind = np.zeros(len(obs), dtype=np.int8)
    uoff = np.full(len(obs), -1, dtype=np.int64)
    boff = np.full(len(obs), -1, dtype=np.int64)
    F = 0
    for o, s in enumerate(obs):
        k = {"u": 1, "b": 2, "*": 3}.get(s[0] if s else "", 0)
        kind[o] = k
        if k & 1:
            uoff[o] = F
            F += Y
        if k & 2:
            boff[o] = F
            F += Y * Y
    theta = np.zeros(F, dtype=np.float64)
    for ln in lines[i:]:
        if "=" not in ln:
            continue
        fid, val = ln.split("=", 1)
        theta[int(fid)] = float.fromhex(val)
    return WapitiModel(
        mtype=int(mtype),
        patterns=[_compile_pattern(p) for p in pats_raw],
        labels=labels,
        obs_ids={s: o for o, s in enumerate(obs)},
        kind=kind,
        uoff=uoff,
        boff=boff,
        theta=theta,
    )


def load_wapiti_model(path: str) -> WapitiModel:
    with open(path, encoding="utf-8", errors="replace") as fh:
        return parse_wapiti_model(fh.read())


def _expand(segs: list, rows: list[list[str]], t: int) -> str:
    """Expand one compiled pattern at position t (Wapiti ``pat_exec``
    semantics: out-of-range rows produce ``_x%+d`` boundary markers)."""
    T = len(rows)
    out = []
    for s in segs:
        if isinstance(s, str):
            out.append(s)
            continue
        cmd, off, col = s
        pos = t + off
        if pos < 0:
            out.append(f"_x{pos}")
        elif pos >= T:
            out.append(f"_x+{pos - T + 1}")
        else:
            v = rows[pos][col] if col < len(rows[pos]) else ""
            out.append(v.lower() if cmd == "X" else v)
    return "".join(out)


def wapiti_viterbi(model: WapitiModel, rows: list[list[str]]) -> list[str]:
    """Label one sequence with the model's own weights: per position,
    expand every pattern, look the obs up, accumulate unigram scores and
    bigram transition matrices, then standard max-sum Viterbi."""
    T = len(rows)
    if T == 0:
        return []
    Y = model.n_labels
    theta, obs_ids = model.theta, model.obs_ids
    psi_u = np.zeros((T, Y))
    psi_b = np.zeros((T, Y, Y))
    for t in range(T):
        for segs in model.patterns:
            o = obs_ids.get(_expand(segs, rows, t))
            if o is None:
                continue
            if model.kind[o] & 1:
                u = model.uoff[o]
                psi_u[t] += theta[u : u + Y]
            if model.kind[o] & 2:
                b = model.boff[o]
                psi_b[t] += theta[b : b + Y * Y].reshape(Y, Y)
    delta = psi_u[0].copy()
    back = np.zeros((T, Y), dtype=np.int64)
    for t in range(1, T):
        m = delta[:, None] + psi_b[t] + psi_u[t][None, :]
        back[t] = m.argmax(axis=0)
        delta = m[back[t], np.arange(Y)]
    y = int(delta.argmax())
    seq = [y]
    for t in range(T - 1, 0, -1):
        y = int(back[t, y])
        seq.append(y)
    seq.reverse()
    return [model.labels[y] for y in seq]


def iob_to_flat(label: str) -> str:
    """Wapiti body labels are IOB-ish: ``<x>`` opens a field, ``I-<x>``
    continues it; the engine's flat token labels drop the marker."""
    return label[2:] if label.startswith("I-") else label
