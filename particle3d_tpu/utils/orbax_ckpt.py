"""Orbax checkpoint backend — sharded / async / multi-host snapshots.

The npz backend (``checkpoint.py``) is a single-host, synchronous,
full-gather snapshot. For large sharded runs this backend writes the state
pytree through Orbax instead: arrays are saved with their shardings (each
host writes only its shards), saves can be asynchronous (overlapping the
next simulation window), and restore can re-shard onto a different mesh.

The reference persists nothing at all (SURVEY.md §5; eframe persistence
disabled at ``src/bin/main.rs:836-855``).

Layout: <dir>/<step>/state (Orbax standard pytree) + <dir>/<step>/meta.json
(config + step index, host-side JSON like the npz backend).
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np

from ..config import SimConfig
from ..state import ParticleState
from .checkpoint import _config_to_jsonable, _config_from_jsonable

_FORMAT_VERSION = 1


def _ocp():
    try:
        import orbax.checkpoint as ocp
    except ImportError as e:  # pragma: no cover - orbax ships in the image
        raise ImportError(
            "orbax-checkpoint is required for the orbax backend; "
            "use utils.checkpoint (npz) instead") from e
    return ocp


class OrbaxCheckpointer:
    """Step-indexed checkpoint directory with optional async saves.

    >>> ck = OrbaxCheckpointer(dir, async_save=True)
    >>> ck.save(step, state, cfg)        # returns immediately if async
    >>> state, cfg, step = ck.restore()  # latest step
    """

    def __init__(self, directory: str, *, async_save: bool = False):
        ocp = _ocp()
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = (ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
                       if async_save
                       else ocp.Checkpointer(ocp.StandardCheckpointHandler()))

    # -- write ---------------------------------------------------------------
    def save(self, step: int, state: ParticleState, cfg: SimConfig,
             extra: dict | None = None) -> str:
        step_dir = os.path.join(self.directory, f"{int(step):010d}")
        os.makedirs(step_dir, exist_ok=True)
        meta = {
            "format_version": _FORMAT_VERSION,
            "step_index": int(step),
            "config": _config_to_jsonable(cfg),
            "extra": extra or {},
        }
        with open(os.path.join(step_dir, "meta.json"), "w") as f:
            json.dump(meta, f)
        self._ckptr.save(os.path.join(step_dir, "state"),
                         _state_to_tree(state), force=True)
        return step_dir

    def wait(self) -> None:
        """Block until any in-flight async save completes."""
        if hasattr(self._ckptr, "wait_until_finished"):
            self._ckptr.wait_until_finished()

    # -- read ----------------------------------------------------------------
    def steps(self) -> list[int]:
        out = []
        for name in os.listdir(self.directory):
            p = os.path.join(self.directory, name, "meta.json")
            if name.isdigit() and os.path.exists(p):
                out.append(int(name))
        return sorted(out)

    def _latest_step(self, carry: bool) -> int:
        """Latest step of the requested KIND — a directory may hold both
        state snapshots and slab carries (both written by this class), and
        latest-overall would make restore()/restore_carry() raise on a
        newer checkpoint of the other kind instead of resuming."""
        all_steps = self.steps()
        for step in reversed(all_steps):
            p = os.path.join(self.directory, f"{int(step):010d}", "meta.json")
            with open(p) as f:
                kind = json.load(f).get("kind")
            if (kind == "slab_carry") == carry:
                return step
        what = "slab carries" if carry else "state snapshots"
        raise FileNotFoundError(
            f"no {what} under {self.directory}"
            + (f" ({len(all_steps)} checkpoints of the other kind)"
               if all_steps else ""))

    def restore(self, step: int | None = None, sharding=None):
        """-> (state, config, step_index). ``sharding`` optionally re-shards
        every array on restore (a NamedSharding, for resuming on a mesh)."""
        ocp = _ocp()
        if step is None:
            step = self._latest_step(carry=False)
        step_dir = os.path.join(self.directory, f"{int(step):010d}")
        with open(os.path.join(step_dir, "meta.json")) as f:
            meta = json.load(f)
        if meta.get("format_version") != _FORMAT_VERSION:
            raise ValueError(f"unsupported orbax checkpoint version in {step_dir}")
        if meta.get("kind") == "slab_carry":
            raise ValueError(
                f"checkpoint at step {step} is a stay-sharded slab carry — "
                f"use restore_carry(mesh)")
        tree = self._ckptr.restore(os.path.join(step_dir, "state"))
        state = _state_from_tree(tree)
        if sharding is not None:
            state = jax.tree.map(lambda a: jax.device_put(a, sharding), state)
        cfg = _config_from_jsonable(meta["config"])
        return state, cfg, meta["step_index"]

    # -- stay-sharded slab carry (parallel/domain_sharded.py) ---------------
    # A config-5-scale run (16M over a pod) must checkpoint WITHOUT ever
    # replicating: the carry's arrays are saved with their shardings (each
    # host writes only its own slab rows) and restored sharded onto a mesh.

    def save_carry(self, step: int, carry, cfg: SimConfig, *, nsc: int,
                   cap: int, n: int, extra: dict | None = None) -> str:
        """Save a stay-sharded slab carry ``(data, pid, limbo_data,
        limbo_pid, lost)`` plus the slab geometry needed to resume
        (``sharded_dense_steps`` takes nsc/cap/n as static args)."""
        data, pid, limbo_data, limbo_pid, lost = carry
        tree = {"data": data, "pid": pid, "limbo_data": limbo_data,
                "limbo_pid": limbo_pid, "lost": lost}
        step_dir = os.path.join(self.directory, f"{int(step):010d}")
        os.makedirs(step_dir, exist_ok=True)
        meta = {
            "format_version": _FORMAT_VERSION,
            "kind": "slab_carry",
            "step_index": int(step),
            "config": _config_to_jsonable(cfg),
            "slab": {"nsc": int(nsc), "cap": int(cap), "n": int(n)},
            "shapes": {k: [list(v.shape), str(v.dtype)]
                       for k, v in tree.items()},
            "extra": extra or {},
        }
        with open(os.path.join(step_dir, "meta.json"), "w") as f:
            json.dump(meta, f)
        self._ckptr.save(os.path.join(step_dir, "state"), tree, force=True)
        return step_dir

    def restore_carry(self, mesh=None, step: int | None = None,
                      axis: str = "shard"):
        """-> (carry, config, slab_geometry, step_index). With ``mesh``,
        every carry array is restored SHARDED over ``axis`` (each host
        reads only its slab rows — no replicated stage); ``lost`` stays
        replicated."""
        ocp = _ocp()
        if step is None:
            step = self._latest_step(carry=True)
        step_dir = os.path.join(self.directory, f"{int(step):010d}")
        with open(os.path.join(step_dir, "meta.json")) as f:
            meta = json.load(f)
        if meta.get("format_version") != _FORMAT_VERSION:
            raise ValueError(
                f"unsupported orbax checkpoint version in {step_dir}")
        if meta.get("kind") != "slab_carry":
            raise ValueError(
                f"checkpoint at step {step} is a state snapshot, not a "
                f"slab carry — use restore()")
        kwargs = {}
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            def abstract(name):
                shape, dtype = meta["shapes"][name]
                spec = P() if name == "lost" else P(axis)
                return jax.ShapeDtypeStruct(
                    tuple(shape), np.dtype(dtype),
                    sharding=NamedSharding(mesh, spec))

            target = {k: abstract(k) for k in meta["shapes"]}
            kwargs["args"] = ocp.args.StandardRestore(target)
        tree = self._ckptr.restore(os.path.join(step_dir, "state"), **kwargs)
        carry = (tree["data"], tree["pid"], tree["limbo_data"],
                 tree["limbo_pid"], tree["lost"])
        cfg = _config_from_jsonable(meta["config"])
        return carry, cfg, meta["slab"], meta["step_index"]

    def close(self) -> None:
        self.wait()
        self._ckptr.close()


def _state_to_tree(state: ParticleState) -> dict:
    return {
        "positions": state.positions,
        "velocities": state.velocities,
        "species": state.species,
        "masses": state.masses,
        "accel": state.accel,
    }


def _state_from_tree(tree: dict) -> ParticleState:
    import jax.numpy as jnp

    return ParticleState(
        positions=jnp.asarray(tree["positions"]),
        velocities=jnp.asarray(tree["velocities"]),
        species=jnp.asarray(tree["species"]),
        masses=jnp.asarray(tree["masses"]),
        accel=jnp.asarray(tree["accel"]),
    )
