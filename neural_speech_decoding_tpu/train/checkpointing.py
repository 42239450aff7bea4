"""Training checkpoint / resume (orbax).

The reference has no training persistence at all — its checkpoint story is
load-only inference weights (SURVEY.md §5 "checkpoint/resume"). Production
training needs restartable state: params + optimizer state + epoch are
saved per interval with orbax and restored with an abstract-template
round-trip so optax's namedtuple states come back with the right structure.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Optional, Tuple

import jax


def _manager(directory: Path, keep: int = 3):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        directory.resolve(),
        options=ocp.CheckpointManagerOptions(max_to_keep=keep, create=True),
    )


def save_train_state(
    directory, epoch: int, params: Any, opt_state: Any, keep: int = 3
) -> None:
    import orbax.checkpoint as ocp

    directory = Path(directory)
    with _manager(directory, keep) as mgr:
        mgr.save(
            epoch,
            args=ocp.args.Composite(
                params=ocp.args.StandardSave(params),
                opt_state=ocp.args.StandardSave(opt_state),
            ),
        )
        mgr.wait_until_finished()


def latest_epoch(directory) -> Optional[int]:
    directory = Path(directory)
    if not directory.is_dir():
        return None
    with _manager(directory) as mgr:
        step = mgr.latest_step()
    return None if step is None else int(step)


def restore_train_state(
    directory, params_template: Any, opt_state_template: Any
) -> Tuple[int, Any, Any]:
    """Restore the latest (epoch, params, opt_state). Templates define the
    pytree structure (build them exactly as at cold start)."""
    import orbax.checkpoint as ocp

    directory = Path(directory)
    with _manager(directory) as mgr:
        step = mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {directory}")
        abstract = lambda tree: jax.tree_util.tree_map(  # noqa: E731
            ocp.utils.to_shape_dtype_struct, tree
        )
        restored = mgr.restore(
            step,
            args=ocp.args.Composite(
                params=ocp.args.StandardRestore(abstract(params_template)),
                opt_state=ocp.args.StandardRestore(abstract(opt_state_template)),
            ),
        )
    return int(step), restored["params"], restored["opt_state"]
