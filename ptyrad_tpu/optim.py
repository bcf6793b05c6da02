"""Optimizer construction: per-tensor learning rates, start-iter gating, optax.

Functional replacement for reference src/ptyrad/reconstruction.py:285-368
(create_optimizer) and :783-790 (toggle_grad_requires):

  - the reference builds one torch.optim param-group per optimizable tensor,
    each with its own lr; here optax.multi_transform assigns one inner
    optimizer per parameter label
  - the reference toggles requires_grad per tensor when niter reaches its
    start_iter; here gradients of not-yet-started leaves are zeroed inside the
    jitted step (dynamic in niter, so no recompilation per iteration). With
    zero gradients, Adam-family moments stay exactly zero, so updates are
    exactly zero until the start iteration. (Sole deviation: optax's
    bias-correction step count advances during the frozen phase, a second-
    order difference from torch's per-param step counts.)
  - leaves with lr == 0 are frozen permanently (optax.set_to_zero), matching
    requires_grad=False in the reference.
  - gradient accumulation uses optax.MultiSteps (reference
    reconstruction.py:739-760 normalizes the loss by grad_accumulation and
    steps every k batches; MultiSteps averages accumulated gradients, which is
    the same update).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from ptyrad_tpu.models.state import PtychoParams

class OptStateMismatchError(ValueError):
    """A checkpointed optimizer state is structurally incompatible with the
    current optimizer (different optimizer family / grad_accumulation).
    Deliberately loud: silently starting fresh would masquerade as resume."""


def _asgd(learning_rate: float, lambd: float = 1e-4, alpha: float = 0.75,
          t0: float = 1e6):
    """torch.optim.ASGD's update rule as an optax transform.

    torch (optim/asgd.py) per step t (0-based count, eta_0 = lr):
        param *= 1 - lambd*eta_t ;  param -= eta_t * grad
        eta_{t+1} = lr / (1 + lambd*lr*(t+1))**alpha
    i.e. update = -eta_t * (grad + lambd*param). The polyak-averaged copy
    torch maintains (`ax`) is retrieval-only — it never feeds the update —
    so it is deliberately not carried here. `t0` only affects when torch
    STARTS averaging `ax`; it is accepted for config compatibility.
    """
    del t0

    def init(params):
        del params
        return {"count": jnp.zeros([], jnp.int32)}

    def update(updates, state, params=None):
        if params is None:
            raise ValueError("ASGD requires params")
        eta = learning_rate / (
            1.0 + lambd * learning_rate * state["count"].astype(jnp.float32)
        ) ** alpha
        new_updates = jax.tree_util.tree_map(
            lambda g, p: -eta * (g + lambd * p), updates, params)
        return new_updates, {"count": state["count"] + 1}

    return optax.GradientTransformation(init, update)


# torch.optim names (used by reference configs) -> optax constructors
OPTIMIZER_REGISTRY = {
    "Adam": optax.adam,
    "AdamW": optax.adamw,
    "SGD": optax.sgd,
    "RMSprop": optax.rmsprop,
    "Adagrad": optax.adagrad,
    "Adamax": optax.adamax,
    "NAdam": optax.nadam,
    "RAdam": optax.radam,
    "Adadelta": optax.adadelta,
    "LBFGS": optax.lbfgs,
    # torch.optim long tail (reference instantiates ANY torch.optim name,
    # reconstruction.py:285-368 — full torch 2.x coverage):
    "Rprop": optax.rprop,
    "ASGD": _asgd,
    "Adafactor": optax.adafactor,
    "Muon": None,  # resolved lazily (optax.contrib import)
    # SparseAdam only differs from Adam on sparse gradient layouts, which
    # don't exist on TPU/XLA (all grads dense) — dense SparseAdam IS Adam
    "SparseAdam": optax.adam,
    # optax-native lowercase aliases
    "adam": optax.adam,
    "adamw": optax.adamw,
    "sgd": optax.sgd,
    "rmsprop": optax.rmsprop,
    "lbfgs": optax.lbfgs,
}

PARAM_NAMES = ("obja", "objp", "probe", "probe_pos_shifts", "obj_tilts", "slice_thickness")


def _label_tree(params: PtychoParams) -> PtychoParams:
    """A pytree of string labels congruent with PtychoParams (both Cplx leaves
    of the probe share the 'probe' label)."""
    from ptyrad_tpu.ops.cplx import Cplx

    return PtychoParams(
        obja="obja",
        objp="objp",
        probe=Cplx(re="probe", im="probe"),
        probe_pos_shifts="probe_pos_shifts",
        obj_tilts="obj_tilts",
        slice_thickness="slice_thickness",
    )


def parse_update_params(update_params: Optional[dict]):
    """Extract {name: lr} and {name: start_iter} from the update_params dict
    (reference params/model_params.py:34-95 schema: {name: {start_iter, lr}})."""
    update_params = update_params or {}
    lr = {name: 0.0 for name in PARAM_NAMES}
    start = {name: 1 for name in PARAM_NAMES}
    for name, cfg in update_params.items():
        if name not in PARAM_NAMES:
            raise ValueError(f"Unknown optimizable tensor '{name}'; choose from {PARAM_NAMES}")
        lr[name] = float(cfg.get("lr", 0.0) or 0.0)
        si = cfg.get("start_iter", 1)
        start[name] = int(si) if si is not None else -1  # -1 = never
    return lr, start


def _translate_configs(name: str, configs: dict, ctor):
    """Map torch-named optimizer kwargs (the reference's configs contract —
    'see pytorch docs for configs', reference yml) onto the optax
    constructor, dropping unsupported keys with a warning instead of a
    TypeError at build time."""
    import inspect

    from ptyrad_tpu.utils.logging import vprint

    out = dict(configs)
    if "betas" in out:
        b = out.pop("betas")
        out.setdefault("b1", float(b[0]))
        out.setdefault("b2", float(b[1]))
    if "lr" in out:
        out.setdefault("learning_rate", out.pop("lr"))
    if "history_size" in out:  # torch LBFGS
        out.setdefault("memory_size", int(out.pop("history_size")))
    if "etas" in out:  # torch Rprop: etas=(eta_minus, eta_plus)
        em, ep = out.pop("etas")
        out.setdefault("eta_minus", float(em))
        out.setdefault("eta_plus", float(ep))
    if "step_sizes" in out:  # torch Rprop: step_sizes=(min, max)
        smin, smax = out.pop("step_sizes")
        out.setdefault("min_step_size", float(smin))
        out.setdefault("max_step_size", float(smax))
    sig = inspect.signature(ctor).parameters
    if "weight_decay" in out and "weight_decay" not in sig:
        # torch couples L2 into the gradient BEFORE moment estimation
        # (grad += wd*param) for Adam/SGD/RMSprop/...; optax expresses that
        # as add_decayed_weights chained ahead of the inner transform —
        # dropping it would silently un-regularize reference configs
        wd = float(out.pop("weight_decay"))
        if wd:
            inner = ctor

            def ctor(**kw):  # noqa: A001 — deliberate shadow, see above
                return optax.chain(optax.add_decayed_weights(wd), inner(**kw))

            sig = inspect.signature(inner).parameters
    dropped = [k for k in out if k not in sig]
    for k in dropped:
        vprint(f"WARNING: optimizer '{name}' does not support config '{k}' "
               f"(torch-only or renamed); ignoring it.")
        out.pop(k)
    return ctor, out


def create_optimizer(
    optimizer_params: Optional[dict],
    update_params: Optional[dict],
    params: PtychoParams,
    grad_accumulation: int = 1,
    init_state: bool = True,
):
    """Build (optax optimizer, opt_state, lr_dict, start_iter_dict).

    optimizer_params: {'name': 'Adam', 'configs': {...}} (reference schema).
    update_params: per-tensor {'lr', 'start_iter'}.
    init_state=False returns opt_state=None — for callers that must init
    under jit with explicit out_shardings (shard_canvas LBFGS, whose stacked
    diff memories would otherwise materialize replicated).
    """
    optimizer_params = optimizer_params or {"name": "Adam"}
    name = optimizer_params.get("name", "Adam")
    configs = dict(optimizer_params.get("configs") or {})
    if name not in OPTIMIZER_REGISTRY:
        raise ValueError(
            f"Optimizer '{name}' not supported; choose from "
            f"{sorted(k for k in OPTIMIZER_REGISTRY if k[0].isupper())} "
            "(every torch.optim 2.x name the reference accepts)"
        )
    ctor = OPTIMIZER_REGISTRY[name]
    if name == "Muon":  # lazy: optax.contrib pulls in extra deps at import
        from optax.contrib import muon as ctor  # noqa: F811
    elif name == "SparseAdam":
        from ptyrad_tpu.utils.logging import vprint

        vprint("SparseAdam: gradients are dense under XLA, where SparseAdam's "
               "update coincides with Adam; using Adam.")

    lr_dict, start_dict = parse_update_params(update_params)

    if name in ("LBFGS", "lbfgs"):
        # LBFGS has a single global learning rate: the minimum nonzero lr,
        # FORCED over any user 'lr' config like the reference
        # (reconstruction.py:348-352 overrides configs['lr'])
        nonzero = [v for v in lr_dict.values() if v != 0]
        global_lr = min(nonzero) if nonzero else 1.0
        ctor, configs = _translate_configs(name, configs, ctor)
        configs["learning_rate"] = global_lr
        tx = ctor(**configs)
        zero_mask = _label_tree(params)
        tx = optax.chain(
            optax.masked(optax.set_to_zero(), jax.tree_util.tree_map(
                lambda lbl: lr_dict[lbl] == 0, zero_mask)),
            tx,
        )
    else:
        ctor, configs = _translate_configs(name, configs, ctor)
        configs.pop("learning_rate", None)  # per-tensor lrs own this
        transforms: Dict[str, Any] = {}
        for pname in PARAM_NAMES:
            if lr_dict[pname] == 0:
                transforms[pname] = optax.set_to_zero()
            else:
                transforms[pname] = ctor(learning_rate=lr_dict[pname], **configs)
        tx = optax.multi_transform(transforms, _label_tree(params))

    if grad_accumulation > 1 and name not in ("LBFGS", "lbfgs"):
        # LBFGS excluded: its step already accumulates over ALL batches in a
        # scanned full-dataset objective (engine/solver.build_lbfgs_step), so
        # a MultiSteps wrapper would simply discard k-1 of every k full
        # linesearch steps
        tx = optax.MultiSteps(tx, every_k_schedule=int(grad_accumulation))

    opt_state = tx.init(params) if init_state else None
    return tx, opt_state, lr_dict, start_dict


def mask_unstarted_grads(grads: PtychoParams, niter, start_dict: Dict[str, int]) -> PtychoParams:
    """Zero gradients of tensors whose start_iter has not been reached.

    niter may be a traced scalar; start_iter == -1 means 'never optimize'
    (reference toggle_grad_requires, reconstruction.py:783-790). A name
    absent from start_dict is active from the first iteration (niter is
    1-based; same fallback as freeze_unstarted_params).
    """
    def gate(name):
        si = start_dict.get(name, 1)
        if si < 0:
            return jnp.float32(0.0)
        return (niter >= si).astype(jnp.float32)

    return PtychoParams(
        obja=grads.obja * gate("obja"),
        objp=grads.objp * gate("objp"),
        probe=grads.probe * gate("probe"),
        probe_pos_shifts=grads.probe_pos_shifts * gate("probe_pos_shifts"),
        obj_tilts=grads.obj_tilts * gate("obj_tilts"),
        slice_thickness=grads.slice_thickness * gate("slice_thickness"),
    )


def freeze_unstarted_params(params: PtychoParams, niter, start_dict: Dict[str, int]) -> PtychoParams:
    """start_iter gating on the PARAMS side: x*g + stop_gradient(x)*(1-g) is
    numerically x but blocks gradients while niter < start_iter. Used by the
    LBFGS path, where masking only the outer gradient would leak unmasked
    gradients through the linesearch's internal value_and_grad evaluations
    (reference toggle_grad_requires semantics, reconstruction.py:783-790).
    """
    def gate(name):
        si = start_dict.get(name, 1)
        if si < 0:
            return jnp.float32(0.0)
        return (niter >= si).astype(jnp.float32)

    def apply(name, x):
        g = gate(name)
        return x * g + jax.lax.stop_gradient(x) * (1.0 - g)

    return PtychoParams(
        obja=apply("obja", params.obja),
        objp=apply("objp", params.objp),
        probe=apply("probe", params.probe),
        probe_pos_shifts=apply("probe_pos_shifts", params.probe_pos_shifts),
        obj_tilts=apply("obj_tilts", params.obj_tilts),
        slice_thickness=apply("slice_thickness", params.slice_thickness),
    )


# ---------------------------------------------------------------------------
# Optimizer-state checkpointing (exact resume)
# ---------------------------------------------------------------------------

def save_opt_state(opt_state, path: str) -> None:
    """Serialize an optax state pytree to an orbax checkpoint directory.

    Functional replacement for the reference's optimizer-state HDF5 dump +
    key-repair reload (reconstruction.py:287-366): orbax round-trips the
    pytree structure exactly, so no key coercion is needed.
    """
    import os

    import jax
    import numpy as np
    import orbax.checkpoint as ocp

    # host-convert on EVERY process (np.asarray of REPLICATED global arrays
    # is process-local; opt_state is replicated by design), then EVERY
    # process calls the checkpointer with the same path: orbax's save is
    # itself a multi-process collective (sync_global_processes barriers), so
    # a rank-0-only call would desync the barrier — orbax writes from the
    # primary host and coordinates the rest internally
    opt_state = jax.tree_util.tree_map(
        lambda x: np.asarray(x) if hasattr(x, "shape") and hasattr(x, "dtype") else x,
        opt_state,
    )
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, opt_state, force=True)


def load_opt_state(opt_state_template, path: str):
    """Restore an optax state saved by save_opt_state; the template (a freshly
    initialized state of the same optimizer/params) supplies the structure."""
    import os

    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, target=opt_state_template)


_CANON_VOCAB = frozenset({
    # optax Adam-family state field names (public API, stable across versions)
    "mu", "nu", "count", "trace",
    # our param-tree leaf names
    "obja", "objp", "probe", "re", "im", "probe_pos_shifts", "obj_tilts",
    "slice_thickness",
})


def _canonical_key(keystr: str):
    """Version-tolerant digest of a keystr: the ordered meaningful tokens
    (moment names + param-leaf path), ignoring optax wrapper boilerplate
    (inner_states/inner_state/list indices) that optax is free to rename
    between versions. '.inner_states[\\'obja\\'].inner_state[0].mu.obja' and a
    hypothetical future '.states[\\'obja\\'][0].mu.obja' both digest to
    ('obja', 'mu', 'obja')."""
    import re

    return tuple(t for t in re.findall(r"\w+", keystr) if t in _CANON_VOCAB)


def _apply_keystr_dict(opt_state_template, values: Dict[str, Any], coerce=None):
    """Rebuild an optax state pytree from {jax.tree_util.keystr(path): array}.

    Leaves missing from `values` keep their template value (non-array state
    leaves are never serialized); array dtypes/shapes are coerced to the
    template so a resumed state is structurally identical to a fresh one.
    Exact keystr matching is tried first; a canonical-token fallback
    (_canonical_key) absorbs optax-internal path renames so old checkpoints
    keep resuming across optax upgrades. Raises if NOTHING matches — that
    means the checkpoint was written by a structurally different optimizer
    (e.g. with/without grad accumulation, whose MultiSteps wrapper prefixes
    every path) and a silent fresh state would masquerade as a successful
    resume.

    `coerce(template_leaf, np_array) -> leaf` overrides the default
    reshape-and-cast per matched array leaf — the shard_canvas resume path
    uses it to pad and re-shard canvas-shaped moments onto the mesh
    (parallel/canvas.py make_opt_state_coerce).
    """
    import numpy as np

    if coerce is None:
        def coerce(leaf, arr):
            return jnp.asarray(arr.reshape(leaf.shape), dtype=leaf.dtype)

    flat, treedef = jax.tree_util.tree_flatten_with_path(opt_state_template)

    # canonical index of the checkpoint keys (unique digests only) — enabled
    # only when checkpoint and template have the SAME number of array leaves:
    # a pure rename (optax version bump) preserves arity, while a structural
    # change (e.g. a MultiSteps wrapper adds acc_grads/step leaves) does not
    # and must keep hitting the mismatch guard below
    n_template_arrays = sum(1 for _, leaf in flat if hasattr(leaf, "shape"))
    canon: Dict[tuple, str] = {}
    if len(values) == n_template_arrays:
        dup: set = set()
        for k in values:
            ck = _canonical_key(k)
            if ck in canon:
                dup.add(ck)
            canon[ck] = k
        canon = {ck: k for ck, k in canon.items() if ck not in dup}
    leaves = []
    matched = 0
    canon_matched = 0
    unmatched_arrays = []
    for path, leaf in flat:
        key = jax.tree_util.keystr(path)
        if key not in values and hasattr(leaf, "shape"):
            alias = canon.get(_canonical_key(key))
            if alias is not None:
                key = alias
                canon_matched += 1
        if key in values and hasattr(leaf, "shape"):
            leaves.append(coerce(leaf, np.asarray(values[key])))
            matched += 1
        else:
            if hasattr(leaf, "shape") and getattr(leaf, "size", 0) > 1:
                # moment-sized template leaves with no checkpoint key: a
                # PARTIAL restore (e.g. checkpoint saved with probe frozen,
                # resumed with probe optimizable) must be visible
                unmatched_arrays.append(key)
            leaves.append(leaf)
    if matched == 0:
        sample = next(iter(values), "<empty>")
        raise OptStateMismatchError(
            "optimizer state mismatch: no checkpoint key matches the current "
            f"optimizer's structure (checkpoint keys look like '{sample}') — "
            "was it saved with a different optimizer or grad_accumulation?"
        )
    if canon_matched:
        from ptyrad_tpu.utils.logging import vprint

        vprint(
            f"optimizer-state restore: {canon_matched} leaf(s) matched via "
            "canonical keys (checkpoint written by a different optax "
            "version); values restored exactly"
        )
    if unmatched_arrays:
        from ptyrad_tpu.utils.logging import vprint

        vprint(
            f"WARNING: partial optimizer-state restore — {len(unmatched_arrays)} "
            "state array(s) had no checkpoint entry and start fresh: "
            + ", ".join(unmatched_arrays[:6])
            + (" ..." if len(unmatched_arrays) > 6 else "")
        )
    return jax.tree_util.tree_unflatten(treedef, leaves)


def convert_torch_optim_state(torch_state: Dict[str, Any], update_params: Optional[dict]) -> Dict[str, Any]:
    """Map a torch Adam-family optimizer state_dict (reference checkpoint
    format, reconstruction.py:287-368) onto our keystr naming.

    The reference builds one param group per *nonzero-lr* tensor in
    update_params order (reference models.py:199-207), so torch param index i
    is the i-th nonzero-lr name. torch's per-param 'step' maps onto our
    per-label transform count; 'exp_avg'/'exp_avg_sq' map onto mu/nu, with
    the probe's trailing real-view axis split into the Cplx (re, im) pair.

    Contract (same as the reference's own reload, reconstruction.py:287-368,
    which matches param indices against the CURRENT config): `update_params`
    must list the optimizable tensors in the same order as the run that wrote
    the checkpoint — the torch state carries only indices, and same-shaped
    tensors (obja/objp) cannot be disambiguated by shape.
    """
    import numpy as np

    lr_dict, _ = parse_update_params(update_params)
    names = [n for n in (update_params or {}) if lr_dict.get(n, 0.0) != 0]

    state = torch_state.get("state") or {}
    out: Dict[str, Any] = {}
    for i, name in enumerate(names):
        entry = state.get(str(i), state.get(i))
        if entry is None:
            continue
        prefix = f".inner_states['{name}'].inner_state[0]"
        out[f"{prefix}.count"] = np.asarray(entry["step"])
        for torch_key, ours in (("exp_avg", "mu"), ("exp_avg_sq", "nu")):
            arr = np.asarray(entry[torch_key])
            if name == "probe":
                out[f"{prefix}.{ours}.probe.re"] = arr[..., 0]
                out[f"{prefix}.{ours}.probe.im"] = arr[..., 1]
            else:
                out[f"{prefix}.{ours}.{name}"] = arr
    return out


def load_opt_state_values(opt_state_abstract, path: str) -> Dict[str, Any]:
    """Restore a save_opt_state orbax directory as {keystr: np.ndarray}.

    `opt_state_abstract` is a jax.eval_shape of the optimizer's init on the
    REPLICATED (host-layout) params — it supplies structure and host-numpy
    restore targets, so nothing touches a device. Used by the shard_canvas
    resume path, where the live opt_state template is row-sharded/padded and
    therefore cannot be handed to orbax directly.
    """
    import os

    import numpy as np
    import orbax.checkpoint as ocp

    template = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype) if hasattr(s, "shape") else s,
        opt_state_abstract,
    )
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(path, target=template)
    flat, _ = jax.tree_util.tree_flatten_with_path(restored)
    return {
        jax.tree_util.keystr(p): np.asarray(leaf)
        for p, leaf in flat
        if hasattr(leaf, "shape")
    }


def load_opt_state_hdf5(opt_state_template, ckpt_path: str, update_params: Optional[dict] = None,
                        coerce=None):
    """Restore optimizer state from a model.hdf5 checkpoint's optim_state_dict.

    Accepts both our flattened-keystr layout (written by save.make_save_dict)
    and a reference-written torch state_dict ('state'/'param_groups' keys,
    reference save.py:110), matching the reference's HDF5 optimizer reload
    with key repair (reconstruction.py:287-368). Requires the checkpoint to
    have been saved with 'optim_state' in recon_params.save_result.
    """
    from ptyrad_tpu.load import load_hdf5

    values = load_hdf5(ckpt_path, key="optim_state_dict")
    if not isinstance(values, dict) or not values:
        raise ValueError(
            f"'{ckpt_path}' has no optimizer state; save it with "
            "'optim_state' in recon_params.save_result"
        )
    if "state" in values and "param_groups" in values:
        values = convert_torch_optim_state(values, update_params)
    return _apply_keystr_dict(opt_state_template, values, coerce=coerce)
