"""Driver-side hyperparameter search (the reference's grid-search meta-model,
dere/utils.py:119-207, and per-classifier grids with dev-F1 argmax + early
stop, span_classifier.py:118-182 / slot_classifier.py:113-127).

Each grid point is a full Spark job (featurization stays distributed); the
loop itself is tiny driver control flow. Points are evaluated in a
deterministic order; `early_stop_at` short-circuits on a perfect score the
way the reference stops at F1 == 1.0.
"""

from __future__ import annotations

from dataclasses import dataclass
from itertools import product
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple


@dataclass(frozen=True)
class GridResult:
    best_params: Dict[str, Any]
    best_score: float
    trials: Tuple[Tuple[Dict[str, Any], float], ...]


def grid_search(
    param_grid: Dict[str, Sequence[Any]],
    evaluate: Callable[[Dict[str, Any]], float],
    early_stop_at: Optional[float] = 1.0,
) -> GridResult:
    """Exhaustive grid, argmax by score; ties break to the earlier point
    (the reference keeps the first best, utils.py:168-188)."""
    names = sorted(param_grid)
    trials: List[Tuple[Dict[str, Any], float]] = []
    best: Optional[Tuple[Dict[str, Any], float]] = None
    for values in product(*(param_grid[n] for n in names)):
        params = dict(zip(names, values))
        score = evaluate(params)
        trials.append((params, score))
        if best is None or score > best[1]:
            best = (params, score)
        if early_stop_at is not None and score >= early_stop_at:
            break
    assert best is not None, "empty parameter grid"
    return GridResult(best[0], best[1], tuple(trials))
