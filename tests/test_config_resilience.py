"""S7 (secrets/connection config) + O5 (retry/failure scaffolding)."""

from __future__ import annotations

import json

import pytest

from ytspark.config import Secrets
from ytspark.models import Model, run_models_resilient


class TestSecrets:
    def test_chain_order_and_masking(self, tmp_path, monkeypatch):
        # file layer
        f = tmp_path / "secrets.json"
        f.write_text(
            json.dumps(
                {
                    "googleAPI": {"api_key": "file-key"},
                    "warehouse": {"url": "jdbc:x", "user": "u", "password": "p"},
                }
            )
        )
        monkeypatch.setenv(Secrets.FILE_VAR, str(f))
        assert Secrets().youtube_api_key() == "file-key"
        # env layer beats file
        monkeypatch.setenv(
            f"{Secrets.ENV_PREFIX}googleAPI",
            json.dumps({"api_key": "env-key"}),
        )
        assert Secrets().youtube_api_key() == "env-key"
        # explicit override beats env
        s = Secrets({"googleAPI": {"api_key": "explicit"}})
        assert s.youtube_api_key() == "explicit"
        # values never leak via repr
        assert "env-key" not in repr(s) and "explicit" not in repr(s)

    def test_missing_secret_is_loud(self, monkeypatch):
        monkeypatch.delenv(Secrets.FILE_VAR, raising=False)
        with pytest.raises(KeyError, match="googleAPI"):
            Secrets().youtube_api_key()

    def test_live_source_falls_back_to_secret(self, monkeypatch):
        from ytspark.sources.youtube_datasource import YouTubeReader

        monkeypatch.setenv(
            f"{Secrets.ENV_PREFIX}googleAPI",
            json.dumps({"api_key": "from-secret"}),
        )
        r = YouTubeReader(
            {"mode": "live", "channels": "UCbCmjCuTUZos6Inko4u57UQ"}
        )
        assert r.api_key == "from-secret"

    def test_live_source_still_loud_without_any_key(self, monkeypatch):
        from ytspark.sources.youtube_datasource import YouTubeReader

        monkeypatch.delenv(Secrets.FILE_VAR, raising=False)
        monkeypatch.delenv(
            f"{Secrets.ENV_PREFIX}googleAPI", raising=False
        )
        with pytest.raises(ValueError, match="api_key"):
            YouTubeReader(
                {"mode": "live", "channels": "UCbCmjCuTUZos6Inko4u57UQ"}
            )


class TestResilientDag:
    def _models(self):
        return [
            Model("base", "SELECT 1 AS x"),
            Model("mid", "SELECT x + 1 AS x FROM {{ ref('base') }}"),
            Model("leaf", "SELECT x * 2 AS x FROM {{ ref('mid') }}"),
            Model("island", "SELECT 42 AS x"),
        ]

    def test_transient_failure_retries_then_succeeds(self, spark):
        # transience simulated via a dependency view that appears
        # only before the second attempt — the attempt_hook seam
        ms = [
            Model("base", "SELECT 1 AS x"),
            Model("mid", "SELECT x + 1 AS x FROM transient_dep"),
        ]
        if spark.catalog.tableExists("transient_dep"):
            spark.catalog.dropTempView("transient_dep")

        def mk_dep(name, attempt):
            if name == "mid" and attempt == 1:
                spark.sql("SELECT 1 AS x").createOrReplaceTempView(
                    "transient_dep"
                )

        out, results = run_models_resilient(
            spark, ms, max_retries=2, attempt_hook=mk_dep
        )
        by = {r.name: r for r in results}
        assert by["mid"].status == "success"
        assert by["mid"].attempts == 2
        assert "mid" in out

    def test_exhausted_failure_skips_dependents_not_siblings(self, spark):
        ms = self._models()
        ms[1] = Model("mid", "SELECT x FROM this_view_never_exists_xyz")
        sleeps = []
        out, results = run_models_resilient(
            spark,
            ms,
            max_retries=1,
            backoff_s=0.5,
            sleeper=sleeps.append,
        )
        by = {r.name: r for r in results}
        assert by["base"].status == "success"
        assert by["mid"].status == "failed" and by["mid"].attempts == 2
        assert by["leaf"].status == "skipped_upstream"
        assert by["island"].status == "success"
        assert set(out) == {"base", "island"}
        assert sleeps == [0.5]  # backoff consulted, never real sleep

    def test_clean_run_matches_run_models(self, spark):
        from ytspark.models import run_models

        ms = self._models()
        out, results = run_models_resilient(spark, ms)
        assert all(r.status == "success" and r.attempts == 1 for r in results)
        want = run_models(spark, ms)
        for name in want:
            assert out[name].collect() == want[name].collect()
