"""CLI + templates: create/run parity with packages/cli, and the scaffolded
projects actually run against the engine (not just materialize)."""

import importlib.util
import json
import os

import pytest

from crawlee_spark.cli import main
from crawlee_spark.templates import MANIFEST, get_template, template_names


# ---------------------------------------------------------------------------
# manifest integrity
# ---------------------------------------------------------------------------


def test_manifest_templates_complete():
    assert template_names() == ["getting-started", "curation"]
    for t in MANIFEST["templates"]:
        files = t["files"]
        assert "main.py" in files
        assert "crawlee.json" in files
        assert "README.md" in files
        manifest = json.loads(files["crawlee.json"])
        # the run command's contract: a "start" script exists
        assert "start" in manifest["scripts"]
        compile(files["main.py"], f"{t['name']}/main.py", "exec")


def test_get_template_unknown_raises():
    with pytest.raises(KeyError):
        get_template("nope")


# ---------------------------------------------------------------------------
# create
# ---------------------------------------------------------------------------


def test_create_scaffolds_and_rewrites_name(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    assert main(["create", "my-crawler-proj"]) == 0
    proj = tmp_path / "my-crawler-proj"
    for rel in get_template("getting-started")["files"]:
        assert (proj / rel).exists(), rel
    manifest = json.loads((proj / "crawlee.json").read_text())
    # CreateProjectCommand.ts:180 name rewrite
    assert manifest["name"] == "my-crawler-proj"
    assert os.access(proj / "submit.sh", os.X_OK)
    # README placeholder substituted
    assert "my-crawler-proj" in (proj / "README.md").read_text()
    assert "{project}" not in (proj / "README.md").read_text()
    assert "was created" in capsys.readouterr().out


def test_create_existing_dir_refuses(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    (tmp_path / "taken").mkdir()
    assert main(["create", "taken"]) == 1
    assert "already exists" in capsys.readouterr().err


def test_create_bad_names_rejected(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    # empty, path separators, and JSON/regex-hostile characters all refuse
    # with exit code 1 (uniform error contract) and scaffold nothing
    for bad in ["", f"a{os.sep}b", 'a"b', "a\\g", "a b", ".hidden"]:
        assert main(["create", bad]) == 1, bad
        assert list(tmp_path.iterdir()) == [], bad
    capsys.readouterr()


def test_create_curation_template(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    assert main(["create", "curate-me", "--template", "curation"]) == 0
    assert (tmp_path / "curate-me" / "main.py").exists()


# ---------------------------------------------------------------------------
# run
# ---------------------------------------------------------------------------


def _write_probe_project(tmp_path):
    """A crawlee.json whose start script dumps its env to a file."""
    out = tmp_path / "env.json"
    script = (
        "python -c \"import json,os;"
        "json.dump(dict(os.environ), open(r'%s','w'))\"" % out
    )
    (tmp_path / "crawlee.json").write_text(
        json.dumps({"name": "probe", "scripts": {"start": script}}))
    return out


def test_run_exports_purge_env_only_with_no_purge(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    monkeypatch.delenv("CRAWLEE_PURGE_ON_START", raising=False)
    out = _write_probe_project(tmp_path)

    assert main(["run"]) == 0
    env = json.loads(out.read_text())
    # RunProjectCommand.ts:34-36: purge stays default-on -> no env override
    assert "CRAWLEE_PURGE_ON_START" not in env

    assert main(["run", "--no-purge"]) == 0
    env = json.loads(out.read_text())
    assert env["CRAWLEE_PURGE_ON_START"] == "0"


def test_run_missing_manifest_and_script(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    assert main(["run"]) == 1
    assert "not a crawlee_spark project" in capsys.readouterr().err
    _write_probe_project(tmp_path)
    assert main(["run", "--script", "deploy"]) == 1
    assert "deploy" in capsys.readouterr().err


def test_run_propagates_script_exit_code(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    (tmp_path / "crawlee.json").write_text(
        json.dumps({"scripts": {"start": "exit 7"}}))
    assert main(["run"]) == 7


def test_run_malformed_manifest_is_friendly(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    (tmp_path / "crawlee.json").write_text("{not json,}")
    assert main(["run"]) == 1
    assert "Cannot read crawlee.json" in capsys.readouterr().err
    (tmp_path / "crawlee.json").write_text(
        json.dumps({"scripts": ["not", "a", "map"]}))
    assert main(["run"]) == 1
    assert "must map names" in capsys.readouterr().err


# ---------------------------------------------------------------------------
# the scaffolded projects run end-to-end
# ---------------------------------------------------------------------------


def _load_scaffolded_main(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_getting_started_project_crawls(tmp_path, monkeypatch, spark):
    from crawlee_spark.configuration import Configuration

    monkeypatch.chdir(tmp_path)
    assert main(["create", "starter"]) == 0
    monkeypatch.setenv("CRAWLEE_STORAGE_DIR", str(tmp_path / "storage"))
    Configuration.reset_global_configuration()
    try:
        mod = _load_scaffolded_main(tmp_path / "starter" / "main.py",
                                    "starter_main")
        totals = mod.run(spark=spark, pages=30, hosts=3, n_seeds=3)
        assert totals["handled"] > 0
        # the fetch log landed in the default dataset under the storage dir
        from crawlee_spark.store.dataset import open_dataset

        ds = open_dataset(spark)
        rows = ds.get_data().collect()
        # one fetch-log row per attempt: at least every handled fetch
        assert len(rows) >= totals["handled"] > 0
        assert {"unique_key", "step", "status", "retry_count"} <= set(
            ds.get_data().columns)
        # a --no-purge rerun RESUMES (nothing left to crawl) and must not
        # duplicate the first run's dataset rows
        monkeypatch.setenv("CRAWLEE_PURGE_ON_START", "0")
        Configuration.reset_global_configuration()
        totals2 = mod.run(spark=spark, pages=30, hosts=3, n_seeds=3)
        assert totals2["handled"] == 0
        assert len(ds.get_data().collect()) == len(rows)
    finally:
        Configuration.reset_global_configuration()


def test_curation_project_curates(tmp_path, monkeypatch, spark):
    monkeypatch.chdir(tmp_path)
    assert main(["create", "cur", "--template", "curation"]) == 0
    mod = _load_scaffolded_main(tmp_path / "cur" / "main.py", "cur_main")
    src = "/root/testdata/sf0.001/documents.parquet"
    total = spark.read.parquet(src).count()
    kept = mod.run(src, str(tmp_path / "out.parquet"), spark=spark,
                   min_words=5)
    assert 0 < kept <= total
