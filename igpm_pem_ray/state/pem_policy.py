"""PEM-analog adaptive recompute-scope policy (T4/T5 heuristic stand-in).

The reference drives incremental matching with a DQN (Keras) whose
environment loop is: observation = (graph density, affected-community
fraction), action in {SHRINK, GROW, KEEP} applied to the community-size
threshold that scopes recomputation, reward = 100/elapsed capped
(/root/reference/patternmatching/gray/incremental/rl_model.py:146-189,
gray_incremental.py:214-222).  The RL stack itself is out of scope
(declared in SURVEY.md; no TF in this container) — this module
reproduces the same observation/action/reward LOOP with a deterministic
hill-climbing policy: keep moving the threshold in the direction that
improved the reward, flip when it stopped improving.

The scope rule mirrors the reference's get_recompute_nodes: an affected
community is recomputed whole when its size is <= threshold, else only
the affected vertices themselves are re-seeded.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

SHRINK, GROW, KEEP = 0, 1, 2
MAX_REWARD = 100.0  # reference gray_incremental.py:220-222


@dataclass
class PemPolicy:
    threshold: int              # community-size threshold (scope knob)
    min_threshold: int = 1
    max_threshold: int = 1 << 30
    _direction: int = field(default=1, repr=False)      # +1 grow, -1 shrink
    _prev_reward: float | None = field(default=None, repr=False)
    history: list = field(default_factory=list, repr=False)

    def reward(self, elapsed_sec: float) -> float:
        return min(MAX_REWARD, 100.0 / max(elapsed_sec, 1e-9))

    def act(self, observation: tuple[float, float], elapsed_sec: float) -> int:
        """One env step: returns the action taken AND applies it to the
        threshold.  observation = (total_density, affected_community_
        fraction) — same Box(2) the reference feeds its network."""
        r = self.reward(elapsed_sec)
        if self._prev_reward is None:
            action = KEEP
        else:
            if r < self._prev_reward:        # got slower: reverse course
                self._direction = -self._direction
            action = GROW if self._direction > 0 else SHRINK
        if action == SHRINK and self.threshold > self.min_threshold:
            self.threshold -= 1
        elif action == GROW and self.threshold < self.max_threshold:
            self.threshold += 1
        self._prev_reward = r
        self.history.append({"observation": tuple(float(x) for x in observation),
                             "action": int(action), "reward": float(r),
                             "threshold": int(self.threshold)})
        return action


def recompute_scope_arrays(affected: np.ndarray, vids: np.ndarray,
                           comp: np.ndarray, threshold: int) -> np.ndarray:
    """Vectorized :func:`recompute_scope` over the runner's native
    arrays (``vids`` sorted, ``comp[i]`` = component id of ``vids[i]``)
    — no V-sized Python dict (round-2 verdict item #8)."""
    affected = np.asarray(affected, dtype=np.int64)
    if not len(affected) or not len(vids):
        return affected
    pos = np.searchsorted(vids, affected)
    pos_c = np.minimum(pos, len(vids) - 1)
    hit = vids[pos_c] == affected
    touched = np.unique(comp[pos_c[hit]])
    uniq_c, counts_c = np.unique(comp, return_counts=True)
    sizes = counts_c[np.searchsorted(uniq_c, touched)]
    expand = touched[sizes <= threshold]
    if len(expand):
        members = vids[np.isin(comp, expand)]
        return np.union1d(affected, members)
    return np.unique(affected)


def recompute_scope(affected: np.ndarray, component_of: dict | None,
                    component_sizes: dict, threshold: int) -> np.ndarray:
    """Expand the affected vertex set to whole communities of size <=
    threshold (reference get_recompute_nodes, rl_model.py:54-76 —
    community structure here comes from the WCC labels the runner
    already maintains instead of a fresh recursive Louvain)."""
    if component_of is None or not len(affected):
        return np.asarray(affected, dtype=np.int64)
    out = set(int(v) for v in affected)
    touched = {component_of[v] for v in out if v in component_of}
    expand = {c for c in touched if component_sizes.get(c, 0) <= threshold}
    if expand:
        for v, c in component_of.items():
            if c in expand:
                out.add(int(v))
    return np.fromiter(sorted(out), dtype=np.int64)
