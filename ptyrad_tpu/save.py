"""Savers: arrays, checkpoints, self-describing output folders, result images.

Feature parity with reference src/ptyrad/save.py: TIFF/NPY/HDF5 array writers,
the recursive dict->HDF5 checkpoint serializer with a "__NONE__" sentinel
(schema-compatible with reference checkpoints so either framework can resume
the other's runs), configuration-encoding output folder names with
minimal/default/all affix presets, params-file provenance copies, and
save_results writing object/probe images at multiple reductions, bit depths,
and fields of view.
"""

from __future__ import annotations

import os
import shutil
from datetime import datetime
from typing import Any, Dict, List, Optional

import numpy as np

from ptyrad_tpu.utils.common import safe_filename
from ptyrad_tpu.utils.logging import vprint
from ptyrad_tpu.utils.nested import NONE_SENTINEL

# ---------------------------------------------------------------------------
# Primitive writers
# ---------------------------------------------------------------------------

def normalize_from_zero_to_one(arr: np.ndarray) -> np.ndarray:
    lo, hi = arr.min(), arr.max()
    return (arr - lo) / (hi - lo) if hi > lo else np.zeros_like(arr)


def normalize_by_bit_depth(arr: np.ndarray, bit: str) -> np.ndarray:
    """'8'/'16' -> normalized uint; '32' -> normalized float32; 'raw' -> float32
    (reference utils/image_proc.py:414-432)."""
    arr = np.asarray(arr)
    if bit == "8":
        return np.uint8(255 * normalize_from_zero_to_one(arr))
    if bit == "16":
        return np.uint16(65535 * normalize_from_zero_to_one(arr))
    if bit == "32":
        return np.float32(normalize_from_zero_to_one(arr))
    return np.float32(arr)


def imwrite_tif(file_path: str, data: np.ndarray) -> None:
    """Write a 2D or 3D (stack) array as TIFF via PIL (tifffile not required)."""
    from PIL import Image

    # hypertune collate strings stacked on 'all'-affix folder names can push
    # a basename past 255 bytes (ENAMETOOLONG) — the reference guards every
    # result write with safe_filename (reference save.py:562-625)
    file_path = safe_filename(file_path)
    data = np.asarray(data)
    if data.ndim > 3:
        data = data.reshape(-1, *data.shape[-2:])
    if data.ndim == 2:
        Image.fromarray(data).save(file_path)
    else:
        frames = [Image.fromarray(frame) for frame in data]
        frames[0].save(file_path, save_all=True, append_images=frames[1:])


def save_array(
    data, file_dir: str = "", file_name: str = "ptyrad_init_meas",
    file_format: str = "hdf5", output_shape=None, append_shape: bool = True, **kwargs,
) -> str:
    """Write an array as .tif/.npy/.hdf5, optionally reshaped to
    `output_shape` first (reference save.py:40-81)."""
    data = np.asarray(data)
    if output_shape is not None:
        try:
            data = data.reshape(output_shape)
        except ValueError as e:
            # reference behavior (save.py:55-58): warn and keep the shape
            vprint(f"WARNING: {e}, the data shape is preserved as {data.shape}")
    shape_str = "_" + "_".join(str(s) for s in data.shape) if append_shape else ""
    if file_dir:
        os.makedirs(file_dir, exist_ok=True)
    file_format = file_format.lower()
    # extension tracks file_format exactly, like the reference (save.py:67)
    path = safe_filename(os.path.join(file_dir, f"{file_name}{shape_str}.{file_format}"))
    if file_format in ("tif", "tiff"):
        imwrite_tif(path, data)
    elif file_format == "npy":
        np.save(path, data)
    elif file_format in ("hdf5", "h5", "mat"):
        # 'mat' is HDF5 as if it were .mat v7.3 (py4DGUI compat, reference
        # save.py:77-79); dataset name 'meas' + gzip is the export contract
        import h5py

        with h5py.File(path, "w") as hf:
            hf.create_dataset("meas", data=data, compression="gzip", **kwargs)
    else:
        raise ValueError(
            f"Unsupported file_format '{file_format}'; use 'tif', 'npy', 'hdf5', 'h5', or 'mat'"
        )
    vprint(f"Saved array with shape {data.shape} to '{path}'")
    return path


# ---------------------------------------------------------------------------
# Checkpoint serialization
# ---------------------------------------------------------------------------

def _to_numpy(value):
    """jax arrays / Cplx -> numpy (complex for Cplx)."""
    from ptyrad_tpu.ops.cplx import Cplx, to_numpy as cplx_to_numpy

    if isinstance(value, Cplx):
        return cplx_to_numpy(value)
    if hasattr(value, "__array__") and not isinstance(value, np.ndarray):
        return np.asarray(value)
    return value


def save_dict_to_hdf5(d: Dict[str, Any], output_path: str, **kwargs) -> None:
    """Recursively serialize a nested dict to HDF5 (reference save.py:142-233).

    None -> the "__NONE__" sentinel; integer keys -> strings; lists of
    numbers/strings/tuples/arrays -> datasets; anything else -> str().
    """
    import h5py

    output_path = safe_filename(output_path)  # see imwrite_tif

    def _write(group, d):
        for key, value in d.items():
            key = str(key)
            value = _to_numpy(value)
            if value is None:
                group.create_dataset(key, data=NONE_SENTINEL)
            elif isinstance(value, dict):
                _write(group.create_group(key), value)
            elif isinstance(value, (list, tuple)):
                vals = [_to_numpy(v) for v in value]
                if all(isinstance(v, (int, float, np.number, bool)) for v in vals):
                    group.create_dataset(key, data=np.asarray(vals), **kwargs)
                elif all(isinstance(v, str) for v in vals):
                    group.create_dataset(key, data=np.array(vals, dtype=h5py.special_dtype(vlen=str)))
                elif all(isinstance(v, (list, tuple)) for v in vals):
                    try:
                        group.create_dataset(key, data=np.asarray([list(v) for v in vals]), **kwargs)
                    except Exception:
                        group.create_dataset(key, data=str(value))
                elif all(isinstance(v, dict) for v in vals):
                    sub = group.create_group(key)
                    for i, item in enumerate(vals):
                        _write(sub.create_group(str(i)), item)
                elif all(isinstance(v, np.ndarray) for v in vals):
                    try:
                        group.create_dataset(key, data=np.stack(vals), **kwargs)
                    except Exception:
                        group.create_dataset(key, data=str(value))
                else:
                    group.create_dataset(key, data=str(value))
            elif isinstance(value, (int, float, str, bool, np.number)):
                group.create_dataset(key, data=value)
            elif isinstance(value, np.ndarray):
                group.create_dataset(key, data=value, **kwargs)
            else:
                group.create_dataset(key, data=str(value))

    with h5py.File(output_path, "w") as hf:
        _write(hf, d)


def make_save_dict(
    output_path: str, params: "object", buffers, geom, params_dict: dict,
    opt_state, history, niter: int, indices, lr_dict=None, start_dict=None,
) -> Dict[str, Any]:
    """Checkpoint dict (reference save.py:85-140 schema): version, optimizable
    tensors (probe as complex), optional optimizer state, full params dict,
    model attributes, and loss/time/dz/tilt histories."""
    import jax

    from ptyrad_tpu import __version__
    from ptyrad_tpu.ops.cplx import to_numpy as cplx_to_numpy

    optimizable_tensors = {
        "obja": np.asarray(params.obja),
        "objp": np.asarray(params.objp),
        "obj_tilts": np.asarray(params.obj_tilts),
        "slice_thickness": np.asarray(params.slice_thickness),
        "probe": cplx_to_numpy(params.probe),
        "probe_pos_shifts": np.asarray(params.probe_pos_shifts),
    }

    last_terms = dict(history.term_iters[-1]) if history.term_iters else {}

    save_optim = "optim_state" in (
        params_dict.get("recon_params", {}).get("save_result") or []
    )
    optim_state_dict = None
    if save_optim and opt_state is not None:
        flat, _ = jax.tree_util.tree_flatten_with_path(opt_state)
        optim_state_dict = {
            jax.tree_util.keystr(path): np.asarray(leaf)
            for path, leaf in flat
            if hasattr(leaf, "shape")
        }

    return {
        "ptyrad_version": f"ptyrad_tpu-{__version__}",
        "output_path": output_path,
        "optimizable_tensors": optimizable_tensors,
        "optim_state_dict": optim_state_dict,
        "params": params_dict,
        "model_attributes": {
            "detector_blur_std": geom.detector_blur_std,
            "obj_preblur_std": geom.obj_preblur_std,
            "start_iter": start_dict,
            "lr_params": lr_dict,
            "omode_occu": np.asarray(buffers.omode_occu),
            "H": cplx_to_numpy(buffers.H),
            "N_scan_slow": geom.n_scan_slow,
            "N_scan_fast": geom.n_scan_fast,
            "crop_pos": np.asarray(buffers.crop_pos),
            "slice_thickness": float(params.slice_thickness),
            "dx": geom.dx,
            "dk": geom.dk,
            "scan_affine": geom.scan_affine,
            "tilt_obj": geom.tilt_obj,
            "shift_probes": geom.shift_probes,
            "probe_int_sum": float(buffers.probe_int_sum),
        },
        "loss_iters": [[n, v] for n, v in history.loss_iters],
        "iter_times": history.iter_times,
        "dz_iters": [[n, v] for n, v in history.dz_iters],
        "avg_iter_t": float(np.mean(history.iter_times)) if history.iter_times else 0.0,
        "niter": niter,
        "indices": np.asarray(indices),
        # reference save.py:136-137 schema: batch_losses is the last
        # iteration's per-batch values per term (length n_batches; falls back
        # to a one-element epoch-average list for paths that never recorded
        # per-batch values, e.g. LBFGS)
        "batch_losses": (
            {k: list(v) for k, v in history.batch_terms.items()}
            if getattr(history, "batch_terms", None)
            else {k: [v] for k, v in last_terms.items()}
        ),
        "avg_losses": last_terms,
    }


# ---------------------------------------------------------------------------
# Output folder naming
# ---------------------------------------------------------------------------

_DIR_PRESETS = {
    "minimal": ["indices", "meas", "batch", "pmode", "omode", "nlayer"],
    "default": ["indices", "meas", "batch", "pmode", "omode", "nlayer",
                "lr", "model", "constraint", "loss", "affine", "tilt"],
    "all": ["indices", "meas", "batch", "pmode", "omode", "nlayer",
            "optimizer", "start_iter", "lr", "model", "constraint",
            "loss", "illumination", "dx", "affine", "tilt"],
}


def _fmt_lr(v: float) -> str:
    return f"{v:.0e}".replace("e-0", "e-").replace("e+0", "e")


def make_output_folder(
    output_dir: str, indices, params_dict: dict, params, geom,
    recon_dir_affixes: Optional[List[str]] = None, make_dir: bool = True,
) -> str:
    """Compose a self-describing output folder name from ~16 affix options
    with minimal/default/all presets (reference save.py:235-512)."""
    init_params = params_dict.get("init_params", {})
    recon_params = params_dict.get("recon_params", {})
    model_params = params_dict.get("model_params", {})
    constraint_params = params_dict.get("constraint_params", {}) or {}
    loss_params = params_dict.get("loss_params", {}) or {}

    affixes = list(recon_dir_affixes or recon_params.get("recon_dir_affixes") or ["default"])
    expanded: List[str] = []
    for tag in affixes:
        expanded.extend(_DIR_PRESETS.get(tag, [tag]))
    affixes = expanded

    parts: List[str] = []
    prefix_time = recon_params.get("prefix_time", False)
    if prefix_time:
        # named presets match the reference's get_time (utils/common.py:511):
        # 'date' / 'time' / 'datetime' / True, else a raw strftime format
        named = {"date": "%Y%m%d", "time": "%H%M%S",
                 "datetime": "%Y%m%d_%H%M%S", True: "%Y%m%d"}
        fmt = named.get(prefix_time, prefix_time if isinstance(prefix_time, str) else "%Y%m%d")
        parts.append(datetime.now().strftime(fmt))
    if recon_params.get("prefix"):
        parts.append(recon_params["prefix"])

    if "indices" in affixes:
        mode = (recon_params.get("INDICES_MODE") or {}).get("mode", "full")
        parts.append(f"{mode}_N{len(indices)}")
    if "meas" in affixes:
        parts.append(f"dp{geom.probe_shape[-1]}")
        flipT = init_params.get("meas_flipT")
        if flipT is not None:
            parts.append("flipT" + "".join(str(int(x)) for x in flipT))
    if "batch" in affixes:
        group_mode = recon_params.get("GROUP_MODE", "random")
        bs = (recon_params.get("BATCH_SIZE") or {}).get("size", 32)
        bs *= (recon_params.get("BATCH_SIZE") or {}).get("grad_accumulation", 1)
        parts.append(f"{group_mode}{bs}")
    if "pmode" in affixes:
        parts.append(f"p{params.probe.shape[0]}")
    if "omode" in affixes:
        parts.append(f"{params.obja.shape[0]}obj")
    if "nlayer" in affixes:
        nz = params.obja.shape[1]
        dz = float(params.slice_thickness)
        parts.append(f"{nz}slice" + (f"_dz{dz:g}" if nz > 1 else ""))
    if "optimizer" in affixes:
        parts.append((model_params.get("optimizer_params") or {}).get("name", "Adam"))
    update = model_params.get("update_params", {}) or {}
    if "start_iter" in affixes:
        # per-tensor tags only for delayed starts (reference save.py:347-360:
        # None / start at 1 contribute nothing to the folder name)
        si_map = {"probe": "ps", "obja": "oas", "objp": "ops",
                  "probe_pos_shifts": "ss", "obj_tilts": "ts",
                  "slice_thickness": "dzs"}
        for key, tag in si_map.items():
            si = (update.get(key) or {}).get("start_iter")
            if si is not None and si > 1:
                parts.append(f"{tag}{si}")
    if "lr" in affixes:
        # per-tensor tags in the reference's fixed order (save.py:362-377):
        # folder names stay self-describing and comparable side by side
        lr_map = {"probe": "plr", "obja": "oalr", "objp": "oplr",
                  "probe_pos_shifts": "slr", "obj_tilts": "tlr",
                  "slice_thickness": "dzlr"}
        for key, tag in lr_map.items():
            lr_val = (update.get(key) or {}).get("lr", 0)
            if lr_val:
                parts.append(f"{tag}{_fmt_lr(lr_val)}")
    if "model" in affixes:
        if geom.obj_preblur_std:
            parts.append(f"preblur{geom.obj_preblur_std:g}")
        if geom.detector_blur_std:
            parts.append(f"dblur{geom.detector_blur_std:g}")
    if "constraint" in affixes:
        tags = {
            "ortho_pmode": "ortho", "probe_mask_k": "maskk", "fix_probe_int": "fixint",
            "obj_rblur": "rblur", "obj_zblur": "zblur", "kr_filter": "kr",
            "kz_filter": "kz", "complex_ratio": "cratio", "mirrored_amp": "mamp",
            "obja_thresh": "athr", "objp_postiv": "postiv", "tilt_smooth": "tsm",
        }
        active = [tag for name, tag in tags.items()
                  if (constraint_params.get(name) or {}).get("freq") is not None]
        if active:
            parts.append("+".join(active))
    if "loss" in affixes:
        active = [name.replace("loss_", "") for name, cfg in loss_params.items()
                  if isinstance(cfg, dict) and cfg.get("state")]
        if active:
            parts.append("L-" + "+".join(active))
    if "illumination" in affixes:
        parts.append(init_params.get("probe_illum_type") or "electron")
    if "dx" in affixes:
        parts.append(f"dx{geom.dx:.4f}")
    if "affine" in affixes and geom.scan_affine is not None:
        parts.append("affine" + "_".join(f"{v:g}" for v in geom.scan_affine))
    if "tilt" in affixes:
        tilts = np.asarray(params.obj_tilts)
        if np.any(tilts):
            parts.append(f"tilt{tilts[:, 0].mean():.1f}_{tilts[:, 1].mean():.1f}")
    if recon_params.get("postfix"):
        parts.append(recon_params["postfix"])

    folder = "_".join(str(p) for p in parts if p != "")
    path = os.path.join(output_dir, folder)
    if make_dir:
        os.makedirs(path, exist_ok=True)
    return path


def copy_params_to_dir(params_path: Optional[str], output_dir: str) -> None:
    """Copy the original params file into the output folder for provenance
    (reference save.py:514-552)."""
    if not params_path or not os.path.isfile(params_path):
        return
    os.makedirs(output_dir, exist_ok=True)
    shutil.copy2(params_path, os.path.join(output_dir, os.path.basename(params_path)))


# ---------------------------------------------------------------------------
# Result saving
# ---------------------------------------------------------------------------

def _default_result_modes() -> dict:
    """Fallback for hand-built params dicts that skipped validation — taken
    from the SCHEMA's ResultModes defaults so validated and unvalidated
    configs produce the same files (the reference has no save-side default
    at all: its schema always fills result_modes, save.py:557)."""
    from ptyrad_tpu.params.schema import ResultModes

    return ResultModes().model_dump()


_PROP_PROBE_JIT = None


def save_results(
    output_path: str, params, buffers, geom, params_dict: dict,
    opt_state, history, niter: int, indices, lr_dict=None, start_dict=None,
    collate_str: str = "",
) -> None:
    """Write model.hdf5 + obj/probe TIFFs at the configured reductions
    (reference save.py:554-665).

    Object reductions by (omode, Nz): zsum/zstack (multislice), omean/ostd
    (mixed-state), 4D and combined reductions; amplitude uses zmean/zprod.
    """
    from ptyrad_tpu.models.forward import propagated_probe
    from ptyrad_tpu.ops.cplx import to_numpy as cplx_to_numpy

    recon_params = params_dict.get("recon_params", {})
    save_list = recon_params.get("save_result") or ["model", "obj", "probe"]
    modes = {**_default_result_modes(), **(recon_params.get("result_modes") or {})}
    iter_str = "_iter" + str(niter).zfill(4)

    prop_amp = None
    if "probe_prop" in save_list:
        # COLLECTIVE on a process-spanning mesh: the jit dispatch must run on
        # every process (computation follows the global arrays' sharding), so
        # it happens BEFORE the rank-0 write gate below. Jitted (cached per
        # geometry): eagerly-traced jnp ops each cost a remote compile on
        # tunneled backends, and this output is optional.
        import jax
        import jax.numpy as jnp

        global _PROP_PROBE_JIT
        if _PROP_PROBE_JIT is None:
            _PROP_PROBE_JIT = jax.jit(propagated_probe, static_argnums=(2,))
        pp = _PROP_PROBE_JIT(params, buffers, geom, jnp.asarray(indices[:1]))
        pp_np = cplx_to_numpy(pp)  # (Z, pmode, Y, X)
        prop_amp = np.abs(
            np.transpose(pp_np, (0, 2, 1, 3)).reshape(pp_np.shape[0], pp_np.shape[2], -1)
        )

    import jax as _jax

    if _jax.process_count() > 1 and _jax.process_index() != 0:
        return  # collective work done; only rank 0 touches the filesystem

    os.makedirs(output_path, exist_ok=True)

    if "model" in save_list:
        save_dict = make_save_dict(
            output_path, params, buffers, geom, params_dict, opt_state,
            history, niter, indices, lr_dict, start_dict,
        )
        save_dict_to_hdf5(save_dict, os.path.join(output_path, f"model{collate_str}{iter_str}.hdf5"))

    probe = cplx_to_numpy(params.probe)
    # (pmode, Ny, Nx) -> side-by-side amplitude (Ny, pmode*Nx) transposed view
    probe_amp = np.abs(probe.reshape(-1, probe.shape[-1])).T
    objp = np.asarray(params.objp)
    obja = np.asarray(params.obja)
    omode, zslice = objp.shape[0], objp.shape[1]

    pos = np.asarray(buffers.crop_pos)[np.asarray(indices)] + np.array(geom.probe_shape) // 2
    y0, y1 = pos[:, 0].min(), pos[:, 0].max()
    x0, x1 = pos[:, 1].min(), pos[:, 1].max()

    def w(name, arr, bit, postfix):
        imwrite_tif(os.path.join(output_path, f"{name}{postfix}.tif"), normalize_by_bit_depth(arr, bit))

    for bit in modes["bit"]:
        bit_str = {"8": "_08bit", "16": "_16bit", "32": "_32bit"}.get(bit, "")
        if "probe" in save_list:
            w("probe_amp", probe_amp, bit, bit_str + collate_str + iter_str)
        if "probe_prop" in save_list:
            w("probe_prop_amp", prop_amp, bit, bit_str + collate_str + iter_str)
        for fov in modes["FOV"]:
            fov_str = "_crop" if fov == "crop" else ""
            if fov == "crop":
                op = objp[:, :, max(y0 - 1, 0):y1, max(x0 - 1, 0):x1]
                oa = obja[:, :, max(y0 - 1, 0):y1, max(x0 - 1, 0):x1]
            else:
                op, oa = objp, obja
            postfix = fov_str + bit_str + collate_str + iter_str

            if any(k in save_list for k in ("obj", "objp", "object")):
                for dim in modes["obj_dim"]:
                    if omode == 1 and zslice == 1 and dim == 2:
                        w("objp", op[0, 0], bit, postfix)
                    elif omode == 1 and zslice > 1:
                        if dim == 3:
                            w("objp_zstack", op[0], bit, postfix)
                        if dim == 2:
                            w("objp_zsum", op[0].sum(0), bit, postfix)
                    elif omode > 1 and zslice == 1:
                        if dim == 3:
                            w("objp_ostack", op[:, 0], bit, postfix)
                        if dim == 2:
                            w("objp_omean", op[:, 0].mean(0), bit, postfix)
                            w("objp_ostd", op[:, 0].std(0), bit, postfix)
                    elif omode > 1 and zslice > 1:
                        if dim == 4:
                            w("objp_4D", op, bit, postfix)
                        if dim == 3:
                            w("objp_ostack_zsum", op.sum(1), bit, postfix)
                            w("objp_omean_zstack", op.mean(0), bit, postfix)
                        if dim == 2:
                            w("objp_omean_zsum", op.mean(0).sum(0), bit, postfix)

            if "obja" in save_list:
                for dim in modes["obj_dim"]:
                    if omode == 1 and zslice == 1 and dim == 2:
                        w("obja", oa[0, 0], bit, postfix)
                    elif omode == 1 and zslice > 1:
                        if dim == 3:
                            w("obja_zstack", oa[0], bit, postfix)
                        if dim == 2:
                            w("obja_zmean", oa[0].mean(0), bit, postfix)
                            w("obja_zprod", oa[0].prod(0), bit, postfix)
                    elif omode > 1 and zslice == 1:
                        if dim == 3:
                            w("obja_ostack", oa[:, 0], bit, postfix)
                        if dim == 2:
                            w("obja_omean", oa[:, 0].mean(0), bit, postfix)
                            w("obja_ostd", oa[:, 0].std(0), bit, postfix)
                    elif omode > 1 and zslice > 1:
                        if dim == 4:
                            w("obja_4D", oa, bit, postfix)
                        if dim == 3:
                            w("obja_ostack_zmean", oa.mean(1), bit, postfix)
                            w("obja_ostack_zprod", oa.prod(1), bit, postfix)
                            w("obja_omean_zstack", oa.mean(0), bit, postfix)
                        if dim == 2:
                            w("obja_omean_zmean", oa.mean(0).mean(0), bit, postfix)
                            w("obja_omean_zprod", oa.mean(0).prod(0), bit, postfix)
