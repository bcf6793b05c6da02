"""Reconstruction engine: jitted train step, iteration loop, solver facade.

Functional re-design of reference src/ptyrad/reconstruction.py:34-832
(PtyRADSolver.reconstruct, recon_loop, recon_step, compute_loss,
loss_logger): one jit-compiled `train_step(params, opt_state, indices, mask,
niter)` contains forward + loss + jax.value_and_grad + optax update; the
host-side loop feeds uniform-shape padded batches, applies constraints between
iterations, and records loss/time/dz/tilt histories.

Distributed execution: pass a Mesh — parameters replicate, batches (and
optionally the measurement store) shard over the 'data' axis, and XLA's SPMD
partitioner inserts the psum gradient reduction (DDP equivalent, SURVEY.md
§2.9) with no code change in the step itself.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ptyrad_tpu.constraints import ConstraintScheduler
from ptyrad_tpu.engine.batching import make_batches, pad_batches, select_scan_indices
from ptyrad_tpu.losses import combined_loss
from ptyrad_tpu.models.forward import forward, fused_loss_terms, get_measurements
from ptyrad_tpu.models.state import Buffers, Geometry, PtychoParams, make_model
from ptyrad_tpu.optim import create_optimizer, freeze_unstarted_params, mask_unstarted_grads
from ptyrad_tpu.parallel.mesh import make_mesh, shard_model
from ptyrad_tpu.utils.logging import vprint


def build_train_step(
    buffers: Buffers,
    geom: Geometry,
    loss_params: Optional[dict],
    optimizer,
    start_iters: Dict[str, int],
):
    """One jitted optimization step over a (padded) batch of scan indices.

    Gradient flow: value_and_grad through the multislice forward; gradients of
    tensors whose start_iter hasn't arrived are zeroed (dynamic in niter —
    single compilation). Params and optimizer state are donated, so the update
    is in-place in HBM.
    """

    # NOTE: buffers is an explicit argument of the jitted functions (not a
    # closure) so the measurement store is a runtime parameter — closing over
    # a multi-GB array would embed it as a jaxpr constant, which remote-
    # compilation backends serialize into the program.

    def loss_fn(params, bufs, indices, mask):
        # loss-folded fused kernel when in regime (loss_single-only data
        # term, fused forward, omode 1, no detector blur): the data-term
        # partial sums come out of the multislice kernel itself and the
        # per-batch XLA loss glue disappears (models/forward.fused_loss_terms)
        fused = fused_loss_terms(params, bufs, geom, indices, mask, loss_params)
        if fused is not None:
            return fused
        dp, (obja_p, objp_p) = forward(params, bufs, geom, indices)
        meas = get_measurements(bufs, geom, indices)
        total, terms = combined_loss(
            dp, meas, obja_p, objp_p, bufs.omode_occu, loss_params, mask
        )
        return total, terms

    @jax.jit
    def _eval_loss(params, bufs, indices, mask):
        return loss_fn(params, bufs, indices, mask)

    def eval_loss(params, indices, mask):
        return _eval_loss(params, buffers, indices, mask)

    def _step(params, opt_state, bufs, indices, mask, niter):
        (total, terms), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, bufs, indices, mask
        )
        grads = mask_unstarted_grads(grads, niter, start_iters)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        # mask the UPDATES too: decoupled weight decay (AdamW & co) emits
        # -lr*wd*param even for zero grads, which would shrink tensors whose
        # start_iter has not arrived (the reference skips frozen params
        # entirely via requires_grad)
        updates = mask_unstarted_grads(updates, niter, start_iters)
        params = optax.apply_updates(params, updates)
        return params, opt_state, total, terms

    _jitted = jax.jit(_step, donate_argnums=(0, 1))

    def train_step(params, opt_state, indices, mask, niter):
        return _jitted(params, opt_state, buffers, indices, mask, niter)

    return train_step, eval_loss


def build_train_epoch(
    buffers: Buffers,
    geom: Geometry,
    loss_params: Optional[dict],
    optimizer,
    start_iters: Dict[str, int],
):
    """One jitted call per ITERATION: lax.scan over all mini-batches.

    Per-batch dispatch costs ~1 ms of host->device round-trip (worse through
    tunneled backends); at the tBL_WSe2 scale (512 batches/iteration) that is
    seconds of pure overhead per iteration. Scanning the batch axis inside a
    single compiled program removes it entirely and lets XLA pipeline
    consecutive batch steps. Parameters and optimizer state ride the scan
    carry (donated, so the update chain is in-place in HBM).
    """

    def loss_fn(params, bufs, indices, mask):
        # loss-folded fused kernel when in regime (loss_single-only data
        # term, fused forward, omode 1, no detector blur): the data-term
        # partial sums come out of the multislice kernel itself and the
        # per-batch XLA loss glue disappears (models/forward.fused_loss_terms)
        fused = fused_loss_terms(params, bufs, geom, indices, mask, loss_params)
        if fused is not None:
            return fused
        dp, (obja_p, objp_p) = forward(params, bufs, geom, indices)
        meas = get_measurements(bufs, geom, indices)
        total, terms = combined_loss(
            dp, meas, obja_p, objp_p, bufs.omode_occu, loss_params, mask
        )
        return total, terms

    def _epoch(params, opt_state, bufs, idx_all, mask_all, niter):
        def body(carry, xs):
            params, opt_state = carry
            indices, mask = xs
            (total, terms), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, bufs, indices, mask
            )
            grads = mask_unstarted_grads(grads, niter, start_iters)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            # updates masked too: see build_train_step (AdamW decay on
            # unstarted tensors)
            updates = mask_unstarted_grads(updates, niter, start_iters)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), (total, terms)

        (params, opt_state), (totals, terms) = jax.lax.scan(
            body, (params, opt_state), (idx_all, mask_all)
        )
        # terms leaves keep the per-batch axis (n_batches,): callers mean
        # them for logging and record the raw lists in the checkpoint
        # (reference save.py:136-137 batch_losses schema)
        return params, opt_state, jnp.mean(totals), terms

    _jitted = jax.jit(_epoch, donate_argnums=(0, 1))

    def train_epoch(params, opt_state, idx_all, mask_all, niter):
        return _jitted(params, opt_state, buffers, idx_all, mask_all, niter)

    return train_epoch


def build_lbfgs_step(
    buffers: Buffers,
    geom: Geometry,
    loss_params: Optional[dict],
    optimizer,
    start_iters: Optional[Dict[str, int]] = None,
):
    """LBFGS step: grad-accumulated full-dataset value_fn drives the optax
    linesearch.

    The objective is the mean over mini-batches of the per-batch loss,
    evaluated as a rematerialized `lax.scan` over the (n_batches, L) index
    array — so HBM holds one batch of wavefields at a time and
    production-scale LBFGS (e.g. 16,384 DPs) fits on chip. This mirrors the
    reference's LBFGS closure over grad-accumulated batch groups
    (reconstruction.py:697-735); with a single batch it reduces to the
    classic full-batch objective. With equal-size fully-masked batches the
    batch-mean equals the global mean exactly; a padded tail batch weighs
    its samples slightly higher (same semantics as the reference's
    group-summed closure).
    """

    def value_fn_of(bufs, idx_all, mask_all, niter):
        def one_batch(params, indices, mask):
            fused = fused_loss_terms(params, bufs, geom, indices, mask, loss_params)
            if fused is not None:
                return fused[0]
            dp, (obja_p, objp_p) = forward(params, bufs, geom, indices)
            meas = get_measurements(bufs, geom, indices)
            total, _ = combined_loss(
                dp, meas, obja_p, objp_p, bufs.omode_occu, loss_params, mask
            )
            return total

        # remat: without it the scan stacks every batch's forward residuals
        # and the backward needs full-dataset wavefield memory again
        one_batch = jax.checkpoint(one_batch)

        def value_fn(params):
            if start_iters:
                # start_iter gating INSIDE the objective so the linesearch's
                # internal gradient evaluations are gated too
                params = freeze_unstarted_params(params, niter, start_iters)

            def body(acc, xs):
                indices, mask = xs
                return acc + one_batch(params, indices, mask), None

            total, _ = jax.lax.scan(body, jnp.asarray(0.0, jnp.float32), (idx_all, mask_all))
            return total / idx_all.shape[0]

        return value_fn

    @jax.jit
    def _lbfgs_step(params, opt_state, bufs, idx_all, mask_all, niter):
        value_fn = value_fn_of(bufs, idx_all, mask_all, niter)
        value, grad = optax.value_and_grad_from_state(value_fn)(params, state=opt_state)
        updates, opt_state = optimizer.update(
            grad, opt_state, params, value=value, grad=grad, value_fn=value_fn
        )
        params = optax.apply_updates(params, updates)
        return params, opt_state, value

    def lbfgs_step(params, opt_state, idx_all, mask_all, niter=1):
        return _lbfgs_step(params, opt_state, buffers, idx_all, mask_all,
                           jnp.asarray(niter, jnp.int32))

    return lbfgs_step


@dataclass
class ReconHistory:
    """Per-iteration records (reference model.loss_iters/iter_times/dz_iters/
    avg_tilt_iters, models.py:123-126)."""

    loss_iters: List[tuple] = field(default_factory=list)
    iter_times: List[float] = field(default_factory=list)
    dz_iters: List[tuple] = field(default_factory=list)
    avg_tilt_iters: List[tuple] = field(default_factory=list)
    term_iters: List[dict] = field(default_factory=list)
    # last iteration's per-batch values per loss term (length n_batches on
    # the fused-epoch path; reference model.batch_losses, save.py:136-137)
    batch_terms: Dict[str, list] = field(default_factory=dict)


def recon_step(
    train_step,
    params: PtychoParams,
    opt_state,
    batch_idx: np.ndarray,
    batch_mask: np.ndarray,
    niter: int,
    constraint_fn: Optional[ConstraintScheduler],
    buffers: Buffers,
    put_batch: Optional[Callable] = None,
):
    """One full pass over all batches + constraints (reference recon_step,
    reconstruction.py:658-781). Returns (params, opt_state, term_averages);
    the per-batch term values land in `recon_step.last_batch_terms`
    (reference model.batch_losses)."""
    term_lists: Dict[str, list] = {}
    n_batches = batch_idx.shape[0]
    niter_dev = jnp.asarray(niter, jnp.int32)
    for b in range(n_batches):
        idx, msk = batch_idx[b], batch_mask[b]
        if put_batch is not None:
            idx, msk = put_batch(idx, msk)
        params, opt_state, total, terms = train_step(
            params, opt_state, jnp.asarray(idx), jnp.asarray(msk), niter_dev
        )
        # ONE device->host transfer per batch for the whole term dict — a
        # float(val) per term would cost a blocking round-trip each (5 terms
        # x n_batches adds seconds/iteration on tunneled backends)
        terms_host = jax.device_get(terms)
        for name, val in terms_host.items():
            term_lists.setdefault(name, []).append(float(val))
    term_avgs = {k: float(np.mean(v)) for k, v in term_lists.items()}
    recon_step.last_batch_terms = term_lists
    if constraint_fn is not None:
        params = constraint_fn(params, buffers, niter)
    return params, opt_state, term_avgs


def iter_batch_perm(niter: int, n_batches: int) -> np.ndarray:
    """Per-iteration batch-order permutation (the reference shuffles the
    batch ORDER every iteration, reconstruction.py:1059 shuffle(batches)).
    Seeded by the iteration so every rank of a multi-process mesh builds the
    same order, runs reproduce, and hypertune trials see the same dynamics
    as production (engine/hypertune uses this too)."""
    return np.random.default_rng(1000003 * niter + 7).permutation(n_batches)


def put_iter_batches(niter: int, batch_idx: np.ndarray, batch_mask: np.ndarray,
                     put_batch=None):
    """Shuffle the batch order for iteration `niter` (iter_batch_perm) and
    transfer the permuted index/mask arrays to device. Shared by recon_loop
    and the hypertune trial loop so trials see exactly the production
    transfer path (sharding spec, dtype handling)."""
    perm = iter_batch_perm(niter, batch_idx.shape[0])
    idx, msk = batch_idx[perm], batch_mask[perm]
    if put_batch is not None:
        # numpy straight into put_batch/put_global — jnp.asarray first
        # would be a wasted host->device->host roundtrip per iteration
        return put_batch(idx, msk)
    return jnp.asarray(idx), jnp.asarray(msk)


def recon_loop(
    train_step,
    params: PtychoParams,
    opt_state,
    batch_idx: np.ndarray,
    batch_mask: np.ndarray,
    n_iter: int,
    constraint_fn: Optional[ConstraintScheduler],
    buffers: Buffers,
    history: Optional[ReconHistory] = None,
    callback: Optional[Callable] = None,
    start_niter: int = 1,
    verbose: bool = True,
    put_batch: Optional[Callable] = None,
    train_epoch: Optional[Callable] = None,
):
    """NITER outer loop (reference recon_loop, reconstruction.py:589-656).

    When `train_epoch` is given (the fused lax.scan path), each iteration is
    ONE device dispatch over all batches; otherwise falls back to per-batch
    train_step calls. callback(niter, params, history) fires after each
    iteration — the save / plot hook (rank-0 gating is the callback's job).
    Callbacks that declare an `opt_state` parameter also receive the LIVE
    optimizer state: the jitted steps donate their inputs, so any state
    captured before the loop is a deleted buffer by the first save.
    """
    history = history or ReconHistory()
    cb_takes_opt = False
    if callback is not None:
        import inspect

        cb_takes_opt = "opt_state" in inspect.signature(callback).parameters
    batch_idx = np.asarray(batch_idx)
    batch_mask = np.asarray(batch_mask)


    for niter in range(start_niter, start_niter + n_iter):
        t0 = time.perf_counter()
        if train_epoch is not None:
            idx_dev, mask_dev = put_iter_batches(niter, batch_idx, batch_mask, put_batch)
            params, opt_state, total_dev, terms_dev = train_epoch(
                params, opt_state, idx_dev, mask_dev, jnp.asarray(niter, jnp.int32)
            )
            batch_terms = {k: np.asarray(v).tolist() for k, v in terms_dev.items()}
            term_avgs = {k: float(np.mean(v)) for k, v in batch_terms.items()}
            history.batch_terms = batch_terms
            if constraint_fn is not None:
                params = constraint_fn(params, buffers, niter)
        else:
            perm = iter_batch_perm(niter, batch_idx.shape[0])
            params, opt_state, term_avgs = recon_step(
                train_step, params, opt_state, batch_idx[perm], batch_mask[perm], niter,
                constraint_fn, buffers, put_batch,
            )
            history.batch_terms = dict(recon_step.last_batch_terms)
        jax.block_until_ready(params.obja)
        if constraint_fn is not None and getattr(constraint_fn, "due", None) \
                and constraint_fn.due(niter):
            # forced device->host fetch BEFORE the timestamp on iterations
            # where constraint programs dispatched: block_until_ready can
            # return at enqueue on tunneled backends (CLAUDE.md), which
            # would push the constraint time into the NEXT iteration's iter_t
            np.asarray(params.slice_thickness)
        iter_t = time.perf_counter() - t0

        total = float(sum(term_avgs.values()))
        if not np.isfinite(total):
            # failure detection (beyond the reference, SURVEY.md §5): halt on
            # divergence instead of burning the remaining iterations
            vprint(
                f"ERROR: non-finite loss at iter {niter} "
                f"(terms: {term_avgs}); stopping early. Check learning rates, "
                "normalization, and constraint settings.",
            )
            history.loss_iters.append((niter, total))
            break
        history.loss_iters.append((niter, total))
        history.term_iters.append(term_avgs)
        history.iter_times.append(iter_t)
        history.dz_iters.append((niter, float(params.slice_thickness)))
        history.avg_tilt_iters.append((niter, np.asarray(params.obj_tilts).mean(0)))

        term_str = ", ".join(f"{k}: {v:.4f}" for k, v in term_avgs.items())
        vprint(f"Iter: {niter}, Total Loss: {total:.4f}, {term_str}, in {iter_t:.3f} sec",
               verbose=verbose)
        if callback is not None:
            if cb_takes_opt:
                callback(niter, params, history, opt_state=opt_state)
            else:
                callback(niter, params, history)
    return params, opt_state, history


class PtyRADSolver:
    """Reconstruction facade (reference PtyRADSolver, reconstruction.py:34-267).

    Accepts either a full params dict (with 'init_params' handled by the
    Initializer) or a prebuilt init_variables dict. Orchestrates model
    construction, optimizer, batching, the iteration loop, and optional
    data-parallel execution over a device mesh.
    """

    def __init__(
        self,
        params: Optional[dict] = None,
        init_variables: Optional[dict] = None,
        mesh=None,
        n_devices: Optional[int] = None,
        logger=None,
        verbose: bool = True,
    ):
        self.params_dict = params or {}
        self.verbose = verbose
        self.logger = logger
        if init_variables is None:
            from ptyrad_tpu.initialization import Initializer

            init = Initializer(self.params_dict["init_params"], verbose=verbose)
            init.init_all()
            init_variables = init.init_variables
        self.init_variables = init_variables

        model_params = self.params_dict.get("model_params", {})
        self.model_params = model_params
        # mixed precision for the DFT GEMMs (reference --mixed_precision):
        # set before any step is traced — trace-time choice, f32 accumulation
        from ptyrad_tpu.ops.fourier import set_matmul_dtype

        # compute_dtype='bfloat16' (reference autocast equivalent) implies
        # bf16 GEMM operands everywhere — the Pallas kernels read this at
        # trace time (ops/kernel_util.gemm_dtype), which is how the policy
        # reaches both kernel families; an explicit matmul_dtype still wins
        matmul_dtype = model_params.get("matmul_dtype")
        if matmul_dtype is None:
            matmul_dtype = ("bfloat16"
                            if model_params.get("compute_dtype") == "bfloat16"
                            else "float32")
        # silent: every solver builds fresh jitted closures, so the toggle
        # always reaches the programs this instance runs
        set_matmul_dtype(matmul_dtype, silent=True)
        # a previous run's Mosaic-OOM fallback may have forced the XLA patch
        # path; every fresh solver starts with the kernels enabled again
        from ptyrad_tpu.ops.patches import set_force_xla

        set_force_xla(False)
        self.params, self.buffers, self.geom = make_model(init_variables, model_params)

        recon_params = self.params_dict.get("recon_params", {})
        self.recon_params = recon_params
        self.loss_params = self.params_dict.get("loss_params")
        self.constraint_fn = ConstraintScheduler(
            self.params_dict.get("constraint_params"), self.geom, verbose=False
        )

        # Device mesh (data parallelism) — opt-in via mesh or n_devices
        self.mesh = mesh
        if self.mesh is None and n_devices is not None and n_devices > 1:
            self.mesh = make_mesh(n_devices)
        self._canvas = None  # set by _build_canvas (recon_params.shard_canvas)
        self.history = ReconHistory()

    # -- preparation --------------------------------------------------------

    def prepare(self):
        rp = self.recon_params
        im = rp.get("INDICES_MODE", {}) or {}
        indices = select_scan_indices(
            self.geom.n_scan_slow,
            self.geom.n_scan_fast,
            im.get("subscan_slow"),
            im.get("subscan_fast"),
            mode=im.get("mode", "full"),
        )
        batch_size = int(rp.get("BATCH_SIZE", {}).get("size", 32))
        grad_accum = int(rp.get("BATCH_SIZE", {}).get("grad_accumulation", 1))
        group_mode = rp.get("GROUP_MODE", "random")
        pos = np.asarray(self.buffers.crop_pos)
        seed = rp.get("GROUP_MODE_SEED")
        if seed is None and jax.process_count() > 1:
            # multi-process: every rank must build IDENTICAL batches (they
            # feed one SPMD program) — an unseeded shuffle would diverge
            # per rank. The reference solves this with a shared DataLoader
            # (reconstruction.py:124-137); here a fixed seed does.
            seed = 0
        batches = make_batches(indices, pos, batch_size, mode=group_mode, seed=seed)
        n_shards = self.mesh.devices.size if self.mesh is not None else 1
        self.batch_idx, self.batch_mask = pad_batches(batches, multiple_of=n_shards)
        self.indices = indices
        self.grad_accumulation = grad_accum
        return self.batch_idx, self.batch_mask

    def _build(self):
        # Register (or clear) the kernel mesh BEFORE any step is traced: the
        # Pallas kernels consult it at trace time to wrap themselves in
        # shard_map over 'data', keeping per-chip kernel throughput on a mesh
        # instead of falling back to the XLA path (see ops/mesh_env.py).
        from ptyrad_tpu.ops.mesh_env import set_kernel_mesh

        set_kernel_mesh(self.mesh)
        optimizer_params = self.model_params.get("optimizer_params", {"name": "Adam"})
        self.optimizer_name = optimizer_params.get("name", "Adam")
        if self.recon_params.get("shard_canvas"):
            if self.mesh is not None:
                self._build_canvas(optimizer_params)
                return
            vprint(
                "WARNING: recon_params.shard_canvas requires a device mesh "
                "(pass mesh=/n_devices= or --n_devices); running the "
                "replicated path instead.", verbose=self.verbose,
            )
        self.optimizer, self.opt_state, self.lr_dict, self.start_dict = create_optimizer(
            optimizer_params,
            self.model_params.get("update_params"),
            self.params,
            grad_accumulation=getattr(self, "grad_accumulation", 1),
        )
        load_state = optimizer_params.get("load_state")
        if load_state:
            from ptyrad_tpu.optim import (
                OptStateMismatchError,
                load_opt_state,
                load_opt_state_hdf5,
            )

            try:
                if str(load_state).endswith((".hdf5", ".h5")):
                    # model.hdf5 checkpoint (ours or reference-written),
                    # matching reference reconstruction.py:287-368
                    self.opt_state = load_opt_state_hdf5(
                        self.opt_state, load_state,
                        self.model_params.get("update_params"),
                    )
                else:
                    self.opt_state = load_opt_state(self.opt_state, load_state)
                vprint(f"Restored optimizer state from '{load_state}'", verbose=self.verbose)
            except OptStateMismatchError:
                # structurally wrong checkpoint: degrading to a fresh state
                # here would silently defeat the resume the user asked for
                raise
            except (OSError, KeyError, ValueError) as e:
                # I/O-level problems (missing file/dataset, malformed HDF5)
                # fall back to a fresh optimizer, matching reference behavior
                vprint(
                    f"WARNING: failed to restore optimizer state from "
                    f"'{load_state}': {e}. Using fresh state."
                )
        # shard BEFORE building the jitted steps: they close over buffers,
        # so on a mesh the steps must see the sharded store (previously the
        # steps were built twice, once over unsharded buffers and discarded)
        self._put_batch = None
        if self.mesh is not None:
            self.params, self.buffers = shard_model(
                self.params, self.buffers, self.mesh,
                shard_measurements=bool(self.recon_params.get("shard_measurements", True)),
            )

        if self.optimizer_name in ("LBFGS", "lbfgs"):
            self.lbfgs_step = build_lbfgs_step(
                self.buffers, self.geom, self.loss_params, self.optimizer,
                start_iters=self.start_dict,
            )
            self.train_step, self.eval_loss, self.train_epoch = None, None, None
        else:
            self.train_step, self.eval_loss = build_train_step(
                self.buffers, self.geom, self.loss_params, self.optimizer, self.start_dict
            )
            self.train_epoch = build_train_epoch(
                self.buffers, self.geom, self.loss_params, self.optimizer, self.start_dict
            )

        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ptyrad_tpu.parallel.mesh import put_global

            def put_batch(idx, msk):
                idx = np.asarray(idx)
                # batch vectors shard over 'data'; stacked (num_batch, L)
                # epoch arrays shard their last axis. put_global (not plain
                # device_put) so a process-spanning mesh works too.
                spec = P("data") if idx.ndim == 1 else P(None, "data")
                sharding = NamedSharding(self.mesh, spec)
                return (
                    put_global(idx, sharding),
                    put_global(np.asarray(msk), sharding),
                )

            self._put_batch = put_batch
            rep = jax.sharding.NamedSharding(self.mesh, jax.sharding.PartitionSpec())
            self.opt_state = jax.tree_util.tree_map(
                lambda x: put_global(x, rep) if hasattr(x, "shape") else x,
                self.opt_state,
            )

    def _build_canvas(self, optimizer_params):
        """SHARD_CANVAS build (recon_params.shard_canvas — the
        beyond-reference large-field axis, parallel/canvas.py): row-shard
        the object canvases over the mesh, initialize the optimizer directly
        on the sharded leaves (Adam moments row-shard with the canvas), lay
        the measurements out ONCE as the slab-major resident store, and
        train through the scanned store epoch."""
        from ptyrad_tpu.parallel.canvas import (
            build_canvas_gather,
            build_canvas_lbfgs_step,
            build_canvas_store,
            build_canvas_store_epoch,
            build_constraint_bridge,
            build_opt_state_gather,
            canvas_state_shardings,
            make_opt_state_coerce,
            plan_canvas_sharding,
            shard_canvas_params,
        )

        is_lbfgs = self.optimizer_name in ("LBFGS", "lbfgs")
        if is_lbfgs and optimizer_params.get("load_state"):
            raise NotImplementedError(
                "shard_canvas + LBFGS cannot resume optimizer state (the "
                "linesearch state embeds padded param/grad copies); drop "
                "optimizer_params.load_state or use a first-order optimizer")
        # the canvas epoch manages its own shard_map; the patch kernels must
        # take their single-device path INSIDE the shard, not wrap themselves
        # in a nested data-parallel shard_map (and their Pallas gather assumes
        # a replicated canvas, which is exactly what this mode removes)
        from ptyrad_tpu.ops.mesh_env import set_kernel_mesh

        set_kernel_mesh(None)

        import dataclasses as _dc

        noy = self.geom.obj_shape[2]
        n_dev = int(self.mesh.devices.size)
        idx = np.asarray(self.indices)
        pos_all = np.asarray(self.buffers.crop_pos)
        plan = plan_canvas_sharding(
            pos_all[idx], noy, self.geom.probe_shape[0], n_dev)
        # the plan indexed the INDICES_MODE subset; remap its slots to global
        # position ids so shift/tilt gathers and the store address the full
        # parameter tables
        plan = _dc.replace(plan, pos_index=idx[plan.pos_index])

        # abstract replicated params, captured BEFORE sharding: the orbax
        # resume path below restores into this host layout (checkpoints are
        # written replicated/unpadded — build_opt_state_gather — so they are
        # interchangeable across modes and mesh sizes)
        params_abstract = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), self.params)
        self.params = shard_canvas_params(self.params, plan, self.mesh)
        self.optimizer, self.opt_state, self.lr_dict, self.start_dict = create_optimizer(
            optimizer_params,
            self.model_params.get("update_params"),
            self.params,
            grad_accumulation=getattr(self, "grad_accumulation", 1),
            init_state=not is_lbfgs,
        )
        if is_lbfgs:
            # init under jit with explicit shardings: LBFGS's stacked diff
            # memories (m canvas-sized copies each) must be BORN row-sharded
            # — an eager init would materialize them replicated, which is
            # exactly the memory wall shard_canvas removes
            shardings = canvas_state_shardings(
                jax.eval_shape(self.optimizer.init, self.params),
                self.mesh, self.params.obja.shape)
            self.opt_state = jax.jit(
                self.optimizer.init, out_shardings=shardings)(self.params)
        load_state = optimizer_params.get("load_state")
        if load_state:
            from ptyrad_tpu.optim import (
                OptStateMismatchError,
                _apply_keystr_dict,
                load_opt_state_hdf5,
                load_opt_state_values,
            )

            coerce = make_opt_state_coerce(plan, self.mesh, noy)
            try:
                if str(load_state).endswith((".hdf5", ".h5")):
                    # model.hdf5 checkpoint (ours or reference-written torch
                    # state) — moments arrive in the replicated host layout
                    # and coerce pads + row-shards the canvas-shaped ones
                    self.opt_state = load_opt_state_hdf5(
                        self.opt_state, load_state,
                        self.model_params.get("update_params"), coerce=coerce,
                    )
                else:
                    abstract = jax.eval_shape(self.optimizer.init, params_abstract)
                    values = load_opt_state_values(abstract, load_state)
                    self.opt_state = _apply_keystr_dict(
                        self.opt_state, values, coerce=coerce)
                vprint(f"Restored optimizer state from '{load_state}'",
                       verbose=self.verbose)
            except OptStateMismatchError:
                raise
            except (OSError, KeyError, ValueError) as e:
                vprint(
                    f"WARNING: failed to restore optimizer state from "
                    f"'{load_state}': {e}. Using fresh state."
                )
        store = build_canvas_store(self.buffers, self.geom, self.mesh, plan)
        if is_lbfgs:
            # step == the scanned full-store LBFGS objective; _canvas_loop
            # dispatches it once per iteration with ALL batches
            epoch = build_canvas_lbfgs_step(
                self.buffers, self.geom, self.mesh, store, self.loss_params,
                self.optimizer, self.start_dict,
            )
        else:
            epoch = build_canvas_store_epoch(
                self.buffers, self.geom, self.mesh, store, self.loss_params,
                self.optimizer, self.start_dict,
            )
        self._canvas_is_lbfgs = is_lbfgs
        batch_size = int(self.recon_params.get("BATCH_SIZE", {}).get("size", 32))
        n_batches = max(1, -(-len(idx) // batch_size))
        # every iteration batch must hold at least one position: the split is
        # per-slab, so the busiest slab bounds how many batches can be fed
        max_nb = int(plan.mask.reshape(n_dev, -1).sum(axis=1).max())
        if n_batches > max_nb:
            vprint(
                f"WARNING: shard_canvas caps the batch count at {max_nb} "
                f"(busiest slab) — BATCH_SIZE.size {batch_size} asked for "
                f"{n_batches} batches", verbose=self.verbose,
            )
            n_batches = max_nb
        self._canvas = (plan, store, epoch, n_batches)
        # jitted layout programs: all-gather to whole replicated canvases
        # (savers/plotters) and the constraint bridge (gather -> due
        # projections on the TRUE canvas extent -> re-pad -> re-shard) — no
        # host round-trips, process-spanning-mesh safe
        self._canvas_gather = build_canvas_gather(self.mesh, noy)
        # checkpointed optimizer state goes out replicated/unpadded — the
        # same layout the standard path writes (cross-mode resume)
        self._canvas_opt_gather = build_opt_state_gather(
            self.mesh, noy, plan.noy_pad)
        self._canvas_bridge = build_constraint_bridge(
            self.constraint_fn, self.mesh, plan, noy)
        # constraints only read probe_int_sum; don't ship the measurement
        # store into the bridge as a replicated jit argument
        from ptyrad_tpu.parallel.mesh import put_global, replicate

        slim = _dc.replace(self.buffers, measurements=None)
        self._canvas_cbuffers = put_global(slim, replicate(self.mesh))
        self.train_step = self.eval_loss = self.train_epoch = None
        self.lbfgs_step = None
        self._put_batch = None

    def _canvas_loop(self, n_iter: int, callback=None):
        """SHARD_CANVAS iteration loop: per-iteration slab-local reshuffle
        (only tiny slot-index arrays travel), one scanned epoch dispatch, and
        constraints / saves bridged through the replicated layout only on
        iterations where they fire."""
        import inspect

        from jax.sharding import NamedSharding, PartitionSpec as P

        from ptyrad_tpu.parallel.canvas import canvas_iteration_batches
        from ptyrad_tpu.parallel.mesh import put_global

        plan, store, epoch, n_batches = self._canvas
        params, opt_state = self.params, self.opt_state
        history = self.history
        cb_takes_opt = False
        if callback is not None:
            cb_takes_opt = "opt_state" in inspect.signature(callback).parameters
        # Every callback invocation costs a full-canvas all-gather here, so a
        # callback that only acts on save iterations (run_reconstruction's)
        # declares its schedule via the `canvas_save_iters` attribute and is
        # invoked ONLY then (None = never). Callbacks without the attribute
        # keep the every-iteration contract recon_loop/_lbfgs_loop honor —
        # they pay the gather, but they fire when the user expects.
        _UNSET = object()
        cb_gate = getattr(callback, "canvas_save_iters", _UNSET)

        def cb_due(niter):
            if callback is None:
                return False
            if cb_gate is _UNSET:
                return True
            return bool(cb_gate) and niter % cb_gate == 0

        save_optim = "optim_state" in (
            self.recon_params.get("save_result") or [])
        bsh = NamedSharding(self.mesh, P(None, "data"))

        is_lbfgs = getattr(self, "_canvas_is_lbfgs", False)
        if is_lbfgs:
            # LBFGS consumes the FULL store every step (the scanned
            # objective accumulates over all batches); fixed batch split —
            # a reshuffle would change nothing but the accumulation order
            slots_f, mask_f, nval_f = canvas_iteration_batches(
                store, n_batches, 0)
            lbfgs_inputs = (put_global(slots_f, bsh), put_global(mask_f, bsh),
                            jnp.asarray(nval_f))

        for niter in range(1, n_iter + 1):
            t0 = time.perf_counter()
            if is_lbfgs:
                params, opt_state, value = epoch(
                    params, opt_state, store.meas_store, *lbfgs_inputs,
                    jnp.asarray(niter, jnp.int32),
                )
                # same history key the hypertune LBFGS paths record
                term_avgs = {"loss_total": float(value)}
                history.batch_terms = {}
            else:
                slots, mask, nval = canvas_iteration_batches(
                    store, n_batches, niter)
                params, opt_state, _total, terms_dev = epoch(
                    params, opt_state, store.meas_store,
                    put_global(slots, bsh), put_global(mask, bsh),
                    jnp.asarray(nval), jnp.asarray(niter, jnp.int32),
                )
                batch_terms = {k: np.asarray(v).tolist()
                               for k, v in terms_dev.items()}
                term_avgs = {k: float(np.mean(v)) for k, v in batch_terms.items()}
                history.batch_terms = batch_terms
            if self.constraint_fn.due(niter):
                # constraint projections see whole canvases: the jitted
                # bridge all-gathers, applies the due projections on the
                # true canvas extent, and re-shards — dispatched only on
                # iterations where something is actually due
                params = self._canvas_bridge(
                    params, self._canvas_cbuffers, jnp.asarray(niter, jnp.int32))
                # forced fetch: block_until_ready can return at enqueue on
                # tunneled backends (CLAUDE.md) — without it the bridge's
                # device time leaks into the next iteration's iter_t
                np.asarray(params.slice_thickness)
            jax.block_until_ready(params.obja)
            iter_t = time.perf_counter() - t0

            total = float(sum(term_avgs.values()))
            if not np.isfinite(total):
                vprint(
                    f"ERROR: non-finite loss at iter {niter} "
                    f"(terms: {term_avgs}); stopping early. Check learning "
                    "rates, normalization, and constraint settings.",
                )
                history.loss_iters.append((niter, total))
                break
            history.loss_iters.append((niter, total))
            history.term_iters.append(term_avgs)
            history.iter_times.append(iter_t)
            history.dz_iters.append((niter, float(params.slice_thickness)))
            history.avg_tilt_iters.append((niter, np.asarray(params.obj_tilts).mean(0)))
            term_str = ", ".join(f"{k}: {v:.4f}" for k, v in term_avgs.items())
            vprint(
                f"Iter: {niter}, Total Loss: {total:.4f}, {term_str}, "
                f"in {iter_t:.3f} sec", verbose=self.verbose,
            )
            if cb_due(niter):
                # savers/plotters consume whole canvases — hand them the
                # replicated view (jitted all-gather), built only when the
                # callback fires; the optimizer state is gathered ONLY
                # when the save actually writes it (for LBFGS the state is
                # ~2m canvas copies — rematerializing it replicated on every
                # save would be the memory wall shard_canvas removes)
                rep = self._canvas_gather(params)
                if cb_takes_opt:
                    callback(niter, rep, history,
                             opt_state=(self._canvas_opt_gather(opt_state)
                                        if save_optim else opt_state))
                else:
                    callback(niter, rep, history)

        # downstream consumers (final save, visualization, save_opt_state)
        # read self.params as whole canvases; self.opt_state crosses to the
        # canonical host layout only if something will write it
        return (self._canvas_gather(params),
                self._canvas_opt_gather(opt_state) if save_optim else opt_state,
                history)

    # -- run -----------------------------------------------------------------

    def reconstruct(self, callback: Optional[Callable] = None):
        n_iter = int(self.recon_params.get("NITER", 100))
        if getattr(self, "batch_idx", None) is None:
            # don't re-prepare if the caller already did (run_reconstruction
            # plots the grouping figure from prepare()'s batches — a second
            # unseeded prepare would train on DIFFERENT batches than the
            # saved diagnostic; the reference runs prepare_recon once)
            self.prepare()
        if (getattr(self, "train_step", None) is None
                and getattr(self, "lbfgs_step", None) is None
                and self._canvas is None):
            self._build()
        vprint(
            f"Starting reconstruction: {n_iter} iters, "
            f"{self.batch_idx.shape[0]} batches of {self.batch_idx.shape[1]}, "
            f"optimizer={self.optimizer_name}, mesh={self.mesh}",
            verbose=self.verbose,
        )
        try:
            if self._canvas is not None:
                self.params, self.opt_state, self.history = self._canvas_loop(n_iter, callback)
            elif self.optimizer_name in ("LBFGS", "lbfgs"):
                self.params, self.opt_state, self.history = self._lbfgs_loop(n_iter, callback)
            else:
                self.params, self.opt_state, self.history = recon_loop(
                    self.train_step, self.params, self.opt_state,
                    self.batch_idx, self.batch_mask, n_iter,
                    self.constraint_fn, self.buffers,
                    history=self.history, callback=callback,
                    verbose=self.verbose, put_batch=self._put_batch,
                    train_epoch=self.train_epoch,
                )
        except Exception as e:  # noqa: BLE001 — inspect for Mosaic VMEM overflow
            if not self._mosaic_vmem_error(e):
                raise
            # The VMEM-budget heuristic (ops/pallas_*._pick_*) accepted a
            # shape Mosaic could not actually fit. A COMPILE-stage failure
            # never consumed the donated buffers (execution never started),
            # so degrade to the XLA path and retry instead of crashing —
            # safe only before any iteration completed.
            import dataclasses as _dc

            if self.history.loss_iters:
                raise
            vprint(
                "WARNING: the fused Pallas kernel exceeded VMEM at compile "
                "time (the budget heuristic was optimistic for this shape); "
                f"falling back to the XLA path. Mosaic said: {e}"
            )
            # rebuild model state from init_variables, NOT from self.params:
            # if the failure happened after the first step began executing
            # (rather than at compile), the donated params/opt_state buffers
            # are already consumed and any reuse dies on deleted arrays
            self.params, self.buffers, self.geom = make_model(
                self.init_variables, self.model_params
            )
            self.geom = _dc.replace(self.geom, fwd_fused=False)
            # fwd_fused only gates the multislice kernels; the patch
            # gather/scatter kernels have their own dispatch and may be the
            # ones that overflowed — force the XLA path for them too
            from ptyrad_tpu.ops.patches import set_force_xla

            set_force_xla(True)
            self._build()
            # mirror the primary dispatch: under shard_canvas _build()
            # re-entered _build_canvas (train_step/lbfgs_step stay None) and
            # only _canvas_loop can drive the rebuilt state
            if self._canvas is not None:
                self.params, self.opt_state, self.history = self._canvas_loop(n_iter, callback)
            elif self.optimizer_name in ("LBFGS", "lbfgs"):
                self.params, self.opt_state, self.history = self._lbfgs_loop(n_iter, callback)
            else:
                self.params, self.opt_state, self.history = recon_loop(
                    self.train_step, self.params, self.opt_state,
                    self.batch_idx, self.batch_mask, n_iter,
                    self.constraint_fn, self.buffers,
                    history=self.history, callback=callback,
                    verbose=self.verbose, put_batch=self._put_batch,
                    train_epoch=self.train_epoch,
                )
        return self.params, self.history

    @staticmethod
    def _mosaic_vmem_error(e: Exception) -> bool:
        """Does this look like a Mosaic VMEM/scoped-memory COMPILE failure?

        Deliberately narrow: a runtime HBM OOM also says RESOURCE_EXHAUSTED,
        but by then the donated params/opt_state buffers are consumed, so a
        retry would die on deleted arrays and mask the real error — only
        compile-stage signals (vmem / scoped memory / Mosaic lowering)
        qualify for the kernels-off retry."""
        msg = str(e).lower()
        if "nan" in msg:
            return False
        if "hbm" in msg and "vmem" not in msg:
            return False  # runtime HBM OOM, not a kernel VMEM compile failure
        return any(
            s in msg for s in ("vmem", "scoped vector memory", "mosaic")
        )

    def _lbfgs_loop(self, n_iter: int, callback=None):
        """LBFGS iteration loop over the grad-accumulated batch objective."""
        if self._put_batch is not None:
            # hand _put_batch the host NumPy arrays directly — jnp.asarray
            # first would be a device->host->device roundtrip (put_batch
            # starts from np.asarray; see put_iter_batches)
            idx_all, mask_all = self._put_batch(self.batch_idx, self.batch_mask)
        else:
            idx_all = jnp.asarray(self.batch_idx)
            mask_all = jnp.asarray(self.batch_mask)
        params, opt_state = self.params, self.opt_state
        history = self.history
        for niter in range(1, n_iter + 1):
            t0 = time.perf_counter()
            params, opt_state, value = self.lbfgs_step(params, opt_state, idx_all, mask_all, niter)
            params = self.constraint_fn(params, self.buffers, niter)
            # forced device->host fetch BEFORE the timestamp:
            # block_until_ready can return at enqueue on tunneled backends
            # (CLAUDE.md), which would make iter_t record dispatch time only
            value = float(value)
            np.asarray(params.slice_thickness)
            iter_t = time.perf_counter() - t0
            history.loss_iters.append((niter, value))
            history.iter_times.append(iter_t)
            history.dz_iters.append((niter, float(params.slice_thickness)))
            history.avg_tilt_iters.append((niter, np.asarray(params.obj_tilts).mean(0)))
            vprint(f"Iter: {niter}, LBFGS Loss: {float(value):.4f}, in {iter_t:.3f} sec",
                   verbose=self.verbose)
            if callback is not None:
                import inspect

                if "opt_state" in inspect.signature(callback).parameters:
                    callback(niter, params, history, opt_state=opt_state)
                else:
                    callback(niter, params, history)
        return params, opt_state, history

    def run(self, callback: Optional[Callable] = None):
        """Entry point (reference PtyRADSolver.run, reconstruction.py:243-267)."""
        t0 = time.perf_counter()
        result = self.reconstruct(callback=callback)
        vprint(f"Reconstruction finished in {time.perf_counter() - t0:.1f} sec",
               verbose=self.verbose)
        return result
