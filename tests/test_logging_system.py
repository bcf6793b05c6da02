"""Logger buffering/flush and system-introspection smoke tests."""

import logging
import os

import pytest

from ptyrad_tpu.utils.logging import CustomLogger, vprint
from ptyrad_tpu.utils.system import print_device_info, print_system_info, resolve_devices


class TestCustomLogger:
    def teardown_method(self):
        logging.getLogger("ptyrad_tpu").handlers.clear()

    def test_buffered_flush_preserves_prefolder_logs(self, tmp_path, capsys):
        logger = CustomLogger(log_file="test_log.txt", prefix_jobid="7",
                              prefix_date=False, show_timestamp=False)
        vprint("before folder exists")
        out_dir = str(tmp_path / "run_output")
        logger.flush_to_dir(out_dir)
        vprint("after flush")
        logger.close()

        log_path = os.path.join(out_dir, "7_test_log.txt")
        assert os.path.exists(log_path)
        content = open(log_path).read()
        assert "before folder exists" in content  # buffered lines survived
        assert "after flush" in content

    def test_double_flush_no_replay_no_crosstalk(self, tmp_path):
        """A second flush (one per hypertune trial) must not replay
        pre-first-flush logs into the new file, and lines after the second
        flush must not keep mirroring into the first file (review r4;
        reference common.py:191-192 truncates the buffer)."""
        logger = CustomLogger(log_file="t.txt", prefix_date=False, show_timestamp=False)
        vprint("early line")
        d1, d2 = str(tmp_path / "trial1"), str(tmp_path / "trial2")
        logger.flush_to_dir(d1)
        vprint("trial1 line")
        logger.flush_to_dir(d2)
        vprint("trial2 line")
        logger.close()

        c1 = open(os.path.join(d1, "t.txt")).read()
        c2 = open(os.path.join(d2, "t.txt")).read()
        assert "early line" in c1 and "trial1 line" in c1
        assert "early line" not in c2  # no replay of pre-flush buffer
        assert "trial1 line" in c2    # buffered since the first flush
        assert "trial2 line" in c2
        assert "trial2 line" not in c1  # old file handler detached

    def test_vprint_respects_verbose(self, capsys):
        vprint("visible", verbose=True)
        vprint("hidden", verbose=False)
        out = capsys.readouterr().out
        assert "visible" in out and "hidden" not in out


class TestSystemUtils:
    def test_system_info_smoke(self, capsys):
        print_system_info()
        out = capsys.readouterr().out
        assert "jax backend" in out
        assert "device count" in out

    def test_device_info_reports_backend(self, capsys):
        print_device_info()
        out = capsys.readouterr().out
        assert "cpu" in out  # tests force the CPU backend

    def test_device_info_times_out_on_hanging_backend(self, capsys, monkeypatch):
        """Tunneled TPU backends HANG (not error) at init when the chip is
        unreachable; check-tpu must diagnose that instead of freezing."""
        import time

        import jax

        monkeypatch.setattr(jax, "devices", lambda *a, **k: time.sleep(30))
        print_device_info(timeout_s=0.3)
        out = capsys.readouterr().out
        assert "TIMED OUT" in out
        assert "unreachable or saturated" in out

    def test_ensure_backend_alive(self, monkeypatch):
        """cmd_run's fail-fast probe: a hanging jax.devices() raises a
        diagnosis pointing at check-tpu instead of freezing the run."""
        import time

        import jax
        import pytest

        from ptyrad_tpu.utils.system import ensure_backend_alive

        ensure_backend_alive(timeout_s=30.0)  # healthy backend: returns fast

        monkeypatch.setattr(jax, "devices", lambda *a, **k: time.sleep(30))
        with pytest.raises(RuntimeError, match="check-tpu"):
            ensure_backend_alive(timeout_s=0.3)

    def test_resolve_devices(self):
        assert resolve_devices(None) is None
        assert resolve_devices(1) is None
        mesh = resolve_devices(4)
        assert mesh is not None and mesh.devices.size == 4
