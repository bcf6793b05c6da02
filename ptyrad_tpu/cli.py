"""Command-line interface.

Parity with reference src/ptyrad/cli.py:99-143:
  run               -- full reconstruction (or hypertune if enabled in params)
  check-tpu         -- device detection report (the reference's check-gpu)
  print-system-info -- platform/package/device report
  export-meas-init  -- run the Initializer and export processed measurements
  validate-params   -- validate a params file against the schema
"""

from __future__ import annotations

import argparse
import sys



def _jobid_prefix(jobid) -> str:
    """Log-file jobid prefix: only non-zero hypertune worker ids qualify
    (reference common.py:165 gates on jobid != 0)."""
    return "" if jobid in ("0", 0, None, "") else str(jobid)


def _apply_common_overrides(params: dict, args) -> None:
    """CLI flags that override params-file fields."""
    if getattr(args, "mixed_precision", False):
        # reference exposes --mixed_precision at launch (docs/launch/
        # multiGPU.md:41, autocast in reconstruction.py:792-806); here it
        # enables the full bf16 compute policy (wavefield bf16 on the XLA
        # path, bf16 GEMM operands in the kernels; f32 params/accumulation)
        mp = params.setdefault("model_params", {})
        mp["compute_dtype"] = "bfloat16"
        mp["matmul_dtype"] = "bfloat16"


def _maybe_init_multihost(args) -> None:
    """--multihost: bring up jax.distributed BEFORE any backend use so the
    mesh spans all hosts (docs/launch/multi_device.md)."""
    if getattr(args, "multihost", False):
        from ptyrad_tpu.parallel.mesh import init_multihost

        idx, count = init_multihost(
            coordinator_address=getattr(args, "coordinator_address", None),
            num_processes=getattr(args, "num_processes", None),
            process_id=getattr(args, "process_id", None),
        )
        from ptyrad_tpu.utils.logging import vprint

        vprint(f"multihost initialized: process {idx} / {count}")


def cmd_run(args):
    import os

    from ptyrad_tpu.load import load_params
    from ptyrad_tpu.utils.logging import CustomLogger
    from ptyrad_tpu.utils.system import (
        ensure_backend_alive,
        print_system_info,
        resolve_devices,
    )

    given = [f"--{k}" for k in ("coordinator_address", "num_processes", "process_id")
             if getattr(args, k, None) is not None]
    if given and not getattr(args, "multihost", False):
        # these flags only take effect under --multihost; silently discarding
        # them (and skipping the hang guard below) would be a footgun
        raise SystemExit(
            f"{', '.join(given)} requires --multihost (flags are only read "
            "when jax.distributed is initialized)")
    _maybe_init_multihost(args)
    if not getattr(args, "multihost", False):
        # fail fast (with a check-tpu pointer) when the tunnel chip is dead:
        # backend init hangs in native code and would freeze the run forever.
        # Skipped under multihost, where blocking for peer ranks is correct.
        ensure_backend_alive(
            float(os.environ.get("PTYRAD_TPU_BACKEND_TIMEOUT", "180")))
    logger = CustomLogger(
        log_file="ptyrad_tpu_log.txt",
        prefix_jobid=_jobid_prefix(args.jobid),
        append_to_file=True,
        show_timestamp=True,
    )
    print_system_info()
    params = load_params(args.params_path, validate=not args.skip_validate)
    _apply_common_overrides(params, args)
    mesh = resolve_devices(args.n_devices)

    ht = params.get("hypertune_params") or {}
    if ht.get("if_hypertune"):
        from ptyrad_tpu.engine.hypertune import run_hypertune

        run_hypertune(params, mesh=mesh, logger=logger, jobid=args.jobid)
    else:
        from ptyrad_tpu.engine.workflow import run_reconstruction

        run_reconstruction(params, mesh=mesh, logger=logger)


def cmd_check_tpu(args):
    from ptyrad_tpu.utils.system import print_device_info

    print_device_info(timeout_s=float(getattr(args, "timeout", 60.0)))


def cmd_print_system_info(args):
    from ptyrad_tpu.utils.system import print_system_info

    print_system_info()


def cmd_export_meas_init(args):
    """Reference contract (cli.py:45-82): params-file meas_export config,
    overridable by --output (path + extension -> dir/name/format),
    --reshape, and --append (append_shape defaults FALSE here, matching the
    reference's always-override of args.append)."""
    from pathlib import Path

    from ptyrad_tpu.initialization import Initializer
    from ptyrad_tpu.load import load_params

    params = load_params(args.params_path, validate=not args.skip_validate)
    init_params = dict(params["init_params"])
    export_cfg = init_params.get("meas_export")
    if export_cfg in (True, False, None):
        export_cfg = {}
    elif not isinstance(export_cfg, dict):
        raise TypeError("`meas_export` in init_params must be True, False, None, or a dict")
    export_cfg = dict(export_cfg)

    if args.output:
        output_path = Path(args.output)
        export_cfg["file_dir"] = str(output_path.parent)
        export_cfg["file_name"] = output_path.stem
        export_cfg["file_format"] = output_path.suffix.lstrip(".") or "hdf5"
    else:
        export_cfg.setdefault("file_dir", "")
        export_cfg.setdefault("file_name", "ptyrad_init_meas")
        export_cfg.setdefault("file_format", "hdf5")
    if args.reshape:
        export_cfg["output_shape"] = tuple(args.reshape)
    export_cfg["append_shape"] = args.append  # always override

    init_params["meas_export"] = export_cfg
    init = Initializer(init_params)
    init.init_measurements()
    print("Exported processed measurements.")


def cmd_validate_params(args):
    from ptyrad_tpu.load import load_params

    try:
        load_params(args.params_path, validate=True)
    except Exception as e:  # noqa: BLE001 — reference contract (cli.py:86-92):
        # a handled one-line message, not a traceback — but a nonzero exit so
        # scripted use (`validate-params … && deploy`) sees the failure
        print(f"Invalid parameters: {e}")
        return 1
    print(f"Params file '{args.params_path}' is valid.")
    return 0


def cmd_bench(args):
    import os
    import runpy

    import ptyrad_tpu

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(ptyrad_tpu.__file__)))
    bench = os.path.join(repo_root, "bench.py")
    if not os.path.exists(bench):
        bench = "bench.py"  # fall back to cwd
    runpy.run_path(bench, run_name="__main__")


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="ptyrad-tpu",
        description="TPU-native ptychographic reconstruction with automatic differentiation",
    )
    sub = parser.add_subparsers(dest="command", required=True)

    p_run = sub.add_parser("run", help="Run reconstruction or hypertune")
    p_run.add_argument("--params_path", required=True, help="Path to params file (.yml/.toml/.json/.py)")
    p_run.add_argument("--n_devices", type=int, default=None, help="Number of devices for the data mesh")
    p_run.add_argument("--jobid", default="0", help="Job id label for logs (multi-worker hypertune)")
    p_run.add_argument("--skip_validate", action="store_true", help="Skip params validation")
    p_run.add_argument(
        "--mixed_precision", action="store_true",
        help="bf16 compute policy: bf16 wavefield + GEMM operands, f32 "
             "params/accumulation/loss; overrides model_params.compute_dtype",
    )
    p_run.add_argument(
        "--multihost", action="store_true",
        help="Initialize jax.distributed before building the mesh (TPU pods; "
             "the launch-side counterpart of the reference's accelerate launch)",
    )
    p_run.add_argument("--coordinator_address", default=None,
                       help="host:port for manual multi-host launches")
    p_run.add_argument("--num_processes", type=int, default=None)
    p_run.add_argument("--process_id", type=int, default=None)
    p_run.set_defaults(func=cmd_run)

    p_check = sub.add_parser("check-tpu", help="Report detected accelerator devices")
    p_check.add_argument(
        "--timeout", type=float, default=60.0,
        help="Seconds to wait for backend init before diagnosing an "
             "unreachable/saturated TPU tunnel (init HANGS, not errors)",
    )
    p_check.set_defaults(func=cmd_check_tpu)

    p_info = sub.add_parser("print-system-info", help="Print system/package/device info")
    p_info.set_defaults(func=cmd_print_system_info)

    p_export = sub.add_parser("export-meas-init", help="Export initialized measurements")
    p_export.add_argument("--params_path", required=True)
    p_export.add_argument("--skip_validate", action="store_true")
    p_export.add_argument("--output", type=str, default=None,
                          help="Optional output path / file type (.mat, .hdf5, .tif, .npy)")
    p_export.add_argument("--reshape", type=int, nargs="+", default=None,
                          help="Optional new shape, e.g. --reshape 128 128 128 128")
    p_export.add_argument("--append", action="store_true",
                          help="Append the array shape to the file name")
    p_export.set_defaults(func=cmd_export_meas_init)

    p_val = sub.add_parser("validate-params", help="Validate a params file")
    p_val.add_argument("--params_path", required=True)
    p_val.set_defaults(func=cmd_validate_params)

    p_bench = sub.add_parser("bench", help="Run the throughput benchmark")
    p_bench.set_defaults(func=cmd_bench)
    return parser


def main(argv=None) -> int:
    parser = build_parser()
    args = parser.parse_args(argv)
    return int(args.func(args) or 0)


if __name__ == "__main__":
    sys.exit(main())
