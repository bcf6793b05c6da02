"""End-to-end reconstruction workflow: params dict -> solver -> saved results.

Orchestrates what reference PtyRADSolver.reconstruct (reconstruction.py:104-143)
plus recon_loop's save hooks (589-656) do: initialize, build the solver,
create the self-describing output folder, copy the params file for
provenance, and register a SAVE_ITERS callback that writes checkpoints,
result images, and summary plots on process 0.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from ptyrad_tpu.engine.solver import PtyRADSolver
from ptyrad_tpu.save import copy_params_to_dir, make_output_folder, save_results
from ptyrad_tpu.utils.logging import vprint


def run_reconstruction(params: dict, mesh=None, logger=None, verbose: Optional[bool] = None):
    """Full reconstruction from a validated params dict. Returns the solver."""
    recon_params = params.get("recon_params", {})
    if verbose is None:
        verbose = not recon_params.get("if_quiet", False)

    solver = PtyRADSolver(params, mesh=mesh, logger=logger, verbose=verbose)
    solver.prepare()

    import jax as _jax

    output_dir = recon_params.get("output_dir", "output/")
    # non-zero ranks compose the name but never mkdir: with prefix_time a
    # clock tick between ranks could yield a second (empty) directory
    output_path = make_output_folder(
        output_dir, solver.indices, params, solver.params, solver.geom,
        recon_dir_affixes=recon_params.get("recon_dir_affixes"),
        make_dir=_jax.process_index() == 0,
    )
    if _jax.process_count() > 1:
        # with prefix_time the ranks can compose names a clock-tick apart;
        # everyone must adopt rank 0's (orbax saves take the path from every
        # rank and it must match)
        from ptyrad_tpu.parallel.mesh import broadcast_str

        output_path = broadcast_str(output_path)
    vprint(f"Output folder: {output_path}", verbose=verbose)
    if recon_params.get("copy_params", True) and _jax.process_index() == 0:
        copy_params_to_dir(params.get("params_path"), output_path)
    if logger is not None:
        logger.flush_to_dir(output_path)

    # position-grouping figure at preparation time (reference
    # prepare_recon -> plot_pos_grouping, reconstruction.py:430-437)
    _figs = recon_params.get("selected_figs") or []
    if ("group" in _figs or "all" in _figs) and _jax.process_index() == 0:
        try:
            import matplotlib.pyplot as plt

            from ptyrad_tpu.visualization import plot_pos_grouping

            pos = np.asarray(solver.buffers.crop_pos)
            batches = [row[m > 0] for row, m in zip(solver.batch_idx, solver.batch_mask)]
            fig = plot_pos_grouping(pos, batches)
            fig.savefig(os.path.join(output_path, "summary_grouping.png"), dpi=100)
            plt.close(fig)
        except Exception as e:  # noqa: BLE001 — plotting must never kill a run
            vprint(f"WARNING: grouping figure failed: {e}")

    save_iters = recon_params.get("SAVE_ITERS")
    last_saved = {"niter": None}

    def callback(niter, cur_params, history, opt_state=None):
        import jax

        # opt_state comes from the LOOP, not the solver attribute: the jitted
        # steps donate their inputs, so solver.opt_state is a deleted buffer
        # while the loop runs (and stale on CPU where donation is a no-op).
        # Multi-process: save_results/plot_summary run on EVERY rank (their
        # jit dispatches over process-spanning arrays are collective);
        # save_results gates file writes internally, plot_summary via
        # save_fig — rank-0-only file output either way.
        if save_iters and niter % save_iters == 0:
            save_results(
                output_path, cur_params, solver.buffers, solver.geom, params,
                opt_state, history, niter, solver.indices,
                lr_dict=getattr(solver, "lr_dict", None),
                start_dict=getattr(solver, "start_dict", None),
            )
            last_saved["niter"] = niter
            selected = recon_params.get("selected_figs") or []
            if selected:
                try:
                    from ptyrad_tpu.visualization import plot_summary

                    plot_summary(
                        output_path, cur_params, solver.buffers, solver.geom,
                        history, niter, solver.indices, selected_figs=selected,
                        init_variables=getattr(solver, "init_variables", None),
                        save_fig=jax.process_index() == 0,
                    )
                except Exception as e:  # noqa: BLE001 — plotting must never kill a run
                    vprint(f"WARNING: plot_summary failed at iter {niter}: {e}")

    # under shard_canvas every callback invocation costs a full-canvas
    # all-gather; this callback only acts on save iterations, so tell the
    # canvas loop its schedule (solver._canvas_loop honors the attribute;
    # the replicated loops invoke every iteration regardless — the body's
    # own save_iters gate makes that equivalent)
    callback.canvas_save_iters = save_iters
    solver.run(callback=callback)

    # final save — all ranks participate (collective compute inside); writes
    # are rank-0-gated inside save_results / save_opt_state. Skipped when
    # the last iteration landed on a SAVE_ITERS boundary: the callback just
    # wrote this exact checkpoint (multi-GB at production scale).
    n_final = len(solver.history.loss_iters)
    if last_saved["niter"] != n_final or n_final == 0:
        save_results(
            output_path, solver.params, solver.buffers, solver.geom, params,
            solver.opt_state, solver.history, n_final, solver.indices,
            lr_dict=getattr(solver, "lr_dict", None),
            start_dict=getattr(solver, "start_dict", None),
        )
    if "optim_state" in (recon_params.get("save_result") or []):
        from ptyrad_tpu.optim import save_opt_state

        save_opt_state(solver.opt_state, os.path.join(output_path, "optim_state"))
    solver.output_path = output_path
    return solver
