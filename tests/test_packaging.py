"""Cluster-shaped packaging (pyproject.toml + setup.py shim): the
reference ships three installable binaries (.github/workflows/go.yml:
22-29); the Spark engine ships one installable package whose console
script multiplexes the same roles. These tests pin the deployable
surface: metadata parses, the console entry point resolves to the real
main, and the editable install's legacy path (the one this sandbox's
setuptools-without-wheel can run) produces a working `yamon-spark`
script — exercised via the same generated stub pip/easy_install write.
"""

from __future__ import annotations

import os
import subprocess
import sys
import tomllib

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _project() -> dict:
    with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
        return tomllib.load(f)["project"]


def test_pyproject_metadata_parses_and_names_the_package():
    proj = _project()
    assert proj["name"] == "yamon-spark"
    import yamon_spark

    assert proj["version"] == yamon_spark.__version__
    # pyspark must NOT be a hard install dependency (cluster images ship
    # their own Spark; a pip-pulled second Spark is the classic
    # deployment footgun) — it lives in the [spark] extra instead
    assert not any("pyspark" in d for d in proj["dependencies"])
    assert any("pyspark" in d for d in proj["optional-dependencies"]["spark"])


def test_console_entry_point_resolves_and_runs():
    proj = _project()
    target = proj["scripts"]["yamon-spark"]
    mod_name, func_name = target.split(":")
    import importlib

    fn = getattr(importlib.import_module(mod_name), func_name)
    # the entry point IS the CLI main: --help exits 0 through it
    try:
        fn(["--help"])
    except SystemExit as e:
        assert e.code in (0, None)
    else:  # argparse --help always raises SystemExit
        raise AssertionError("expected SystemExit from --help")


def test_installed_script_dry_runs_the_reference_example_config():
    """Drive the deployable surface end-to-end in a subprocess, exactly
    as a cluster user would after `pip install -e .`: map the
    reference's own example agent config and print the plan."""
    ref_cfg = "/root/reference/examples/config-agent.hcl"
    if not os.path.exists(ref_cfg):
        import pytest

        pytest.skip("reference examples not mounted")
    out = subprocess.run(
        [sys.executable, "-m", "yamon_spark", "agent",
         "--landing-dir", "/tmp/unused", "--config", ref_cfg, "--dry-run"],
        capture_output=True, text=True, cwd=REPO, timeout=120,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    import json

    plan = json.loads(out.stdout)
    assert plan["sources"], "mapped agent plan should list sources"
