"""METEOR metric.

Two paths, mirroring the reference's dependency structure
(coco_caption/pycocoevalcap/meteor/meteor.py — a Java stdio daemon around
``meteor-1.5.jar``):

* **jar path** — if the METEOR 1.5 jar is available (``SICZ_TPU_METEOR_JAR``
  env var or a jar next to this file), we speak the same
  ``SCORE ||| refs ||| hyp`` / ``EVAL ||| stats`` stdio protocol for official
  numbers.
* **lite path** — otherwise a pure-Python approximation: METEOR's exact-match
  stage only (unigram alignment on surface forms, harmonic mean weighted 9:1
  toward recall, fragmentation penalty ``0.5 * (chunks/matches)^3``, max over
  references).  This omits the stem/synonym/paraphrase modules, so scores are
  systematically slightly lower than jar METEOR — it is clearly labeled
  ``METEOR(lite)`` in reports.
"""
from __future__ import annotations

import os
import subprocess
import threading
from typing import Dict, List

import numpy as np


def _find_jar() -> str:
    jar = os.environ.get("SICZ_TPU_METEOR_JAR", "")
    if jar and os.path.exists(jar):
        return jar
    local = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "meteor-1.5.jar")
    return local if os.path.exists(local) else ""


def meteor_lite_sentence(hyp: str, refs: List[str],
                         alpha: float = 0.9, beta: float = 3.0,
                         gamma: float = 0.5) -> float:
    """Exact-match METEOR for one sentence: max over references."""
    hyp_words = hyp.split()
    best = 0.0
    for ref in refs:
        ref_words = ref.split()
        # greedy left-to-right unigram alignment on exact matches
        used = [False] * len(ref_words)
        align = []  # hyp position -> ref position
        for i, w in enumerate(hyp_words):
            for j, r in enumerate(ref_words):
                if not used[j] and r == w:
                    used[j] = True
                    align.append((i, j))
                    break
        m = len(align)
        if m == 0:
            continue
        p = m / len(hyp_words)
        r = m / len(ref_words)
        fmean = p * r / (alpha * p + (1 - alpha) * r)
        # count chunks: maximal runs contiguous in both hyp and ref
        chunks = 1
        for (i0, j0), (i1, j1) in zip(align, align[1:]):
            if not (i1 == i0 + 1 and j1 == j0 + 1):
                chunks += 1
        penalty = gamma * (chunks / m) ** beta
        best = max(best, fmean * (1 - penalty))
    return best


class Meteor:
    """Same interface as the reference wrapper (meteor/meteor.py:18-75)."""

    def __init__(self) -> None:
        self._jar = _find_jar()
        self._proc = None
        self._lock = threading.Lock()
        if self._jar:
            env = dict(os.environ)
            env["LC_ALL"] = "en_US.UTF_8"
            self._proc = subprocess.Popen(
                ["java", "-jar", "-Xmx2G", self._jar, "-", "-", "-stdio",
                 "-l", "en", "-norm"],
                cwd=os.path.dirname(os.path.abspath(self._jar)),
                stdin=subprocess.PIPE, stdout=subprocess.PIPE,
                stderr=subprocess.PIPE, env=env,
                universal_newlines=True, bufsize=1)

    @property
    def using_jar(self) -> bool:
        return self._proc is not None

    def compute_score(self, gts: Dict, res: Dict):
        assert gts.keys() == res.keys()
        # gts insertion order — CocoEvalCap zips per-image scores against
        # gts.keys(); sorting here would misassign them (a latent bug in the
        # reference's vendored meteor.py we do not reproduce)
        img_ids = list(gts.keys())
        if self._proc is None:
            scores = [meteor_lite_sentence(res[i][0], gts[i]) for i in img_ids]
            return float(np.mean(scores)), scores
        with self._lock:
            eval_line = "EVAL"
            for i in img_ids:
                assert len(res[i]) == 1
                hyp = res[i][0].replace("|||", "").replace("  ", " ")
                score_line = " ||| ".join(("SCORE", " ||| ".join(gts[i]), hyp))
                self._proc.stdin.write(score_line + "\n")
                eval_line += " ||| " + self._proc.stdout.readline().strip()
            self._proc.stdin.write(eval_line + "\n")
            scores = [float(self._proc.stdout.readline().strip())
                      for _ in img_ids]
            final = float(self._proc.stdout.readline().strip())
        return final, scores

    def method(self) -> str:
        return "METEOR" if self.using_jar else "METEOR(lite)"

    def __del__(self):  # noqa: D105
        if self._proc is not None:
            try:
                self._proc.stdin.close()
                self._proc.kill()
                self._proc.wait()
            except Exception:
                pass
