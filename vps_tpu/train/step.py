"""Data-parallel train step — the TPU-native replacement for the reference's
MMDistributedDataParallel + DistOptimizerHook (NCCL allreduce after backward,
core/utils/dist_utils.py:44-58): the batch is sharded over the mesh's
``data`` axis, the loss is the mean over the global batch, and XLA inserts
the gradient all-reduce over ICI when jit partitions the computation.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def parse_losses(losses: Dict[str, jnp.ndarray]):
    """mmdet parse_losses (apis/train.py:17-37): total = Σ values whose key
    contains 'loss'; everything else is a logged metric."""
    total = sum(v for k, v in losses.items() if "loss" in k)
    log_vars = dict(losses)
    log_vars["loss"] = total
    return total, log_vars


def make_loss_fn(detector, remat: bool = False) -> Callable:
    """loss_fn(params, batch_stats, batch, rng) -> (total, log_vars) over a
    leading device-batch dim B (vmapped single-image losses, global mean).
    Exposed separately from :func:`make_train_step` so tests can assert the
    sharded-mesh gradient equals the single-device full-batch gradient.

    ``remat=True`` wraps the per-sample loss in ``jax.checkpoint`` with the
    ``dots_with_no_batch_dims_saveable`` policy (matmul/conv outputs kept,
    elementwise chains recomputed): the f32 train default (see
    zoo.f32_compute_overrides) doubles activation memory vs bf16 and the
    un-remat'd 800×1600 step exceeds one v5e's HBM by ~0.4 GB — remat
    trades recompute FLOPs for that memory."""

    def loss_fn(params, batch_stats, batch, rng):
        def single(sample, key):
            variables = {"params": params, "batch_stats": batch_stats}
            losses = detector.apply(
                variables,
                img=sample["img"][None],
                ref_img=sample["ref_img"][None],
                gt_bboxes=sample["gt_bboxes"],
                gt_labels=sample["gt_labels"],
                gt_valid=sample["gt_valid"],
                gt_masks=sample["gt_masks"],
                gt_semantic_seg=sample["gt_semantic_seg"][None],
                gt_semantic_seg_Nx=sample["gt_semantic_seg_Nx"][None],
                gt_pids=sample["gt_pids"],
                ref_bboxes=sample["ref_bboxes"],
                ref_valid=sample["ref_valid"],
                method=detector.loss,
                rngs={"sampler": key},
            )
            return losses

        if remat:
            single = jax.checkpoint(
                single,
                policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
            )
        b = batch["img"].shape[0]
        keys = jax.random.split(rng, b)
        losses = jax.vmap(single)(batch, keys)
        losses = jax.tree.map(lambda x: jnp.mean(x), losses)
        total, log_vars = parse_losses(losses)
        return total, log_vars

    return loss_fn


def make_train_step(
    detector,
    tx: optax.GradientTransformation,
    donate: bool = True,
    remat: bool = False,
):
    """Returns train_step(state, batch, rng) -> (state, log_vars).

    ``batch`` arrays carry a leading device-batch dim B; the detector's
    single-image ``loss`` is vmapped over it and averaged — under jit with
    the batch sharded on the ``data`` axis this is DDP. ``remat`` — see
    :func:`make_loss_fn`.
    """

    loss_fn = make_loss_fn(detector, remat=remat)

    def train_step(state: TrainState, batch, rng):
        (total, log_vars), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch, rng
        )
        # Pin the backward/optimizer boundary: without this barrier XLA:TPU
        # interleaves the optimizer arithmetic into the backward's schedule,
        # and the re-fused backward was measured to produce inf/NaN trunk
        # gradients on ~half of all steps (bit-identical data: the fused
        # step computed non-finite grads where a standalone jit(grad(total))
        # was finite — see PERF.md "TPU train-step NaN investigation").
        grads = jax.lax.optimization_barrier(grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        if isinstance(opt_state, optax.ApplyIfFiniteState):
            # surfaced in the train log: cumulative count of steps whose
            # gradients were non-finite and were therefore skipped
            log_vars = dict(log_vars,
                            nonfinite_skips=opt_state.total_notfinite)
        new_state = TrainState(params, state.batch_stats, opt_state, state.step + 1)
        return new_state, log_vars

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()[: n_devices or len(jax.devices())]
    import numpy as np

    return Mesh(np.array(devs), (axis,))


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place batch arrays with the leading dim sharded over the mesh.

    Single process: plain device_put. Multi-process (one process per host,
    the reference's DDP layout): every host passes its LOCAL loader shard —
    device_put would demand the identical GLOBAL value on every process, so
    the per-host shards assemble into the global array via
    make_array_from_process_local_data (host h's rows land on host h's
    devices; no cross-host data movement)."""
    sharding = NamedSharding(mesh, P(axis))
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
    import numpy as np

    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)),
        batch,
    )


def replicate(tree, mesh: Mesh):
    """Replicate a (host-identical) tree over the mesh. Multi-process:
    every host holds the full value, so local data == global data."""
    sharding = NamedSharding(mesh, P())
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
    import numpy as np

    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x), global_shape=np.shape(x)),
        tree,
    )
