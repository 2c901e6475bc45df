"""Shared scratch-root resolution (datacat_ray/scratch.py).

Pins the resolution order (explicit arg > DATACAT_SCRATCH > process
default > tempdir) and the multi-node guard: falling through to the
node-local tempdir on a >1-node cluster must raise, because spill written
to one node's /tmp is silently unreadable from every other node."""

import os
import tempfile

import pytest

from datacat_ray import scratch
from datacat_ray.config import PipelineConfig


@pytest.fixture(autouse=True)
def _clean_state(monkeypatch):
    monkeypatch.delenv(scratch.ENV_VAR, raising=False)
    scratch.set_scratch_root(None)
    yield
    scratch.set_scratch_root(None)


def test_default_is_tempdir_single_node():
    assert scratch.resolve_scratch_root() == tempfile.gettempdir()


def test_explicit_wins_over_everything(monkeypatch):
    monkeypatch.setenv(scratch.ENV_VAR, "/shared/env")
    scratch.set_scratch_root("/shared/config")
    assert scratch.resolve_scratch_root("/shared/explicit") == "/shared/explicit"


def test_env_wins_over_process_default(monkeypatch):
    monkeypatch.setenv(scratch.ENV_VAR, "/shared/env")
    scratch.set_scratch_root("/shared/config")
    assert scratch.resolve_scratch_root() == "/shared/env"


def test_process_default_wins_over_tempdir():
    scratch.set_scratch_root("/shared/config")
    assert scratch.resolve_scratch_root() == "/shared/config"
    assert scratch.scratch_path("x") == os.path.join("/shared/config", "x")


def test_multinode_tempdir_fallback_raises(monkeypatch):
    monkeypatch.setattr(scratch, "_alive_node_count", lambda: 3)
    with pytest.raises(RuntimeError, match="3 alive nodes"):
        scratch.resolve_scratch_root()
    # but every shared-capable source still resolves fine
    assert scratch.resolve_scratch_root("/shared/explicit") == "/shared/explicit"
    monkeypatch.setenv(scratch.ENV_VAR, "/shared/env")
    assert scratch.resolve_scratch_root() == "/shared/env"
    monkeypatch.delenv(scratch.ENV_VAR)
    scratch.set_scratch_root("/shared/config")
    assert scratch.resolve_scratch_root() == "/shared/config"


def test_multinode_reap_root_is_allowed(monkeypatch):
    # per-node maintenance (reaping this node's dead-owner dirs) opts out
    monkeypatch.setattr(scratch, "_alive_node_count", lambda: 3)
    assert (
        scratch.resolve_scratch_root(require_shared=False)
        == tempfile.gettempdir()
    )


def test_pipeline_config_installs_process_default():
    cfg = PipelineConfig.from_dict({"scratch_root": "/shared/from_config"})
    cfg.apply_data_context()
    try:
        assert scratch.resolve_scratch_root() == "/shared/from_config"
    finally:
        scratch.set_scratch_root(None)
    # empty string clears rather than installing ""
    PipelineConfig().apply_data_context()
    assert scratch.resolve_scratch_root() == tempfile.gettempdir()


def test_consumers_use_resolved_root(tmp_path, monkeypatch):
    """The five spill paths all place their dirs under the resolved root."""
    monkeypatch.setenv(scratch.ENV_VAR, str(tmp_path))
    from datacat_ray.pipelines.dedup_ops import minhash_sig_cache_dir

    assert minhash_sig_cache_dir("/some/sf").startswith(str(tmp_path))


def test_reap_bounds_checks_pid(tmp_path, monkeypatch):
    """A scratch dir with an absurd numeric pid suffix must be skipped,
    not crash the caller with OverflowError from os.kill."""
    monkeypatch.setenv(scratch.ENV_VAR, str(tmp_path))
    bad = tmp_path / f"datacat_njp_abc_{10**30}"
    bad.mkdir()
    (bad / "x.parquet").write_bytes(b"")
    from datacat_ray.stages.dedup import reap_stale_scratch

    reap_stale_scratch("datacat_njp_", lambda f: f.endswith(".parquet"))
    assert bad.exists()  # unparseable owner → left alone
