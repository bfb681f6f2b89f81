"""Training-state checkpointing.

The reference checkpoints embeddings to files every 1000 iterations
(``DeepSim/src/DeepSim.py:182-186``) and memoises walks to ``walks.txt``
(``DeepSim/src/main.py:274-278``); there is no optimizer-state checkpoint.
Here training state (params + step + config fingerprint) round-trips
through npz, and the windowed sweeps already persist their own cursors
(graphtpu/dist/windows.py) — together giving resume-at-last-window
fault tolerance (SURVEY.md §5).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Sequence, Tuple

import numpy as np


def save_state(
    path: str,
    arrays: Dict[str, Any],
    step: int = 0,
    meta: Optional[Dict] = None,
) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    payload = {k: np.asarray(v) for k, v in arrays.items()}
    payload["__step__"] = np.asarray(step)
    payload["__meta__"] = np.frombuffer(
        json.dumps(meta or {}).encode(), dtype=np.uint8
    )
    tmp = path + ".tmp"
    np.savez(tmp, **payload)
    os.replace(tmp + ".npz" if os.path.exists(tmp + ".npz") else tmp, path)


def load_state(path: str) -> Tuple[Dict[str, np.ndarray], int, Dict]:
    with np.load(path) as z:
        arrays = {
            k: z[k] for k in z.files if not k.startswith("__")
        }
        step = int(z["__step__"])
        meta = json.loads(bytes(z["__meta__"]).decode()) if "__meta__" in z.files else {}
    return arrays, step, meta
