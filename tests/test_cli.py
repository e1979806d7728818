"""CLI surface tests (click runner; no heavy compute)."""
import importlib.util
import os

import numpy as np
from click.testing import CliRunner


def _load_run_cli():
    path = os.path.join(os.path.dirname(__file__), "..", "run.py")
    spec = importlib.util.spec_from_file_location("nafp_run", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.cli


def test_help_lists_three_verbs():
    r = CliRunner().invoke(_load_run_cli(), ["--help"])
    assert r.exit_code == 0
    for verb in ("train", "generate", "evaluate"):
        assert verb in r.output


def test_train_help_mentions_resume():
    r = CliRunner().invoke(_load_run_cli(), ["train", "--help"])
    assert r.exit_code == 0
    assert "resume" in r.output.lower()


def test_missing_config_exits_nonzero(tmp_path):
    r = CliRunner().invoke(_load_run_cli(),
                           ["train", "x", "-c", "no_such_config"])
    assert r.exit_code != 0


def test_evaluate_requires_index():
    r = CliRunner().invoke(_load_run_cli(), ["evaluate", "name_only"])
    assert r.exit_code != 0


def test_console_entry_point_importable():
    from nafp_tpu.cli import main
    r = CliRunner().invoke(main, ["--help"])
    assert r.exit_code == 0 and "evaluate" in r.output


def test_run_py_delegates_to_package_cli():
    # run.py must be a shim over nafp_tpu.cli, not a second definition.
    from nafp_tpu.cli import main
    assert _load_run_cli() is main


def test_live_table_fallback_and_rates():
    """LiveTable degrades to the rolling line off-TTY and tracks rates."""
    from nafp_tpu.search.table import LiveTable
    with LiveTable([1, 3, 5], use_curses=False) as t:
        assert t._scr is None          # no curses takeover off-TTY
        t.update(0, [50.0, 60.0, 70.0, 80.0], 10, 20, 1.5)
        t.update(2, [10.0, 20.0, 30.0, 40.0], 20, 20, 2.0)
        t.line_break()
    assert t.rates[0, 0] == 50.0 and t.rates[3, 2] == 40.0
    assert t.rates[:, 1].sum() == 0.0
