"""Data-path resolution tests (user dir vs bundled package data)."""

import json

from fluidgym_tpu.utils import data_utils


def test_user_dir_preferred_when_populated(tmp_path, monkeypatch):
    from fluidgym_tpu.config import config

    monkeypatch.setattr(config, "_data_path", tmp_path / "user")
    user = tmp_path / "user" / "initial_domains" / "some_id"
    user.mkdir(parents=True)
    (user / "train_00.json").write_text("{}")
    bundled = tmp_path / "bundled"
    (bundled / "initial_domains" / "some_id").mkdir(parents=True)
    monkeypatch.setattr(data_utils, "BUNDLED_DATA", bundled)
    assert data_utils.initial_domain_dir("some_id") == user


def test_bundled_fallback_for_reads(tmp_path, monkeypatch):
    from fluidgym_tpu.config import config

    monkeypatch.setattr(config, "_data_path", tmp_path / "user")
    bundled = tmp_path / "bundled"
    bdir = bundled / "initial_domains" / "some_id"
    bdir.mkdir(parents=True)
    (bdir / "domain_statistics.json").write_text(json.dumps({"m": {"mean": 1.0}}))
    monkeypatch.setattr(data_utils, "BUNDLED_DATA", bundled)

    # reads resolve to the bundled copy
    assert data_utils.initial_domain_dir("some_id") == bdir
    assert data_utils.load_statistics("some_id")["m"]["mean"] == 1.0
    # writes always target the user dir
    assert data_utils.initial_domain_dir("some_id", write=True) == (
        tmp_path / "user" / "initial_domains" / "some_id")
    data_utils.save_uncontrolled_episode("some_id", "train", 0,
                                         [{"a": 1.0}])
    assert (tmp_path / "user" / "initial_domains" / "some_id"
            / "train_00_uncontrolled_episode.csv").exists()
