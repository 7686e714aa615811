"""Secrets / connection configuration (SURVEY §2 S7).

The reference resolves credentials through two layers: Airflow
connections (``dags/extract.py:41-44`` — ``BaseHook.get_connection``)
and AWS Secrets Manager JSON blobs — secret ``"googleAPI"`` holding
``{"api_key": ...}`` (``dags/extract.py:140-145``) and secret
``"snowflake_data"`` holding user/password/account/warehouse/database
(``dags/extract.py:47-60``). The engine twin keeps the same NAMED-
SECRET-of-JSON model but swaps the cloud backend for a provider
CHAIN that works anywhere Spark runs:

1. explicit overrides (constructor dict — tests, notebooks),
2. process environment: ``YTSPARK_SECRET_<NAME>`` holding the JSON
   blob (the container/CI idiom),
3. a JSON secrets file at ``$YTSPARK_SECRETS_FILE`` mapping name ->
   blob (the mounted-volume idiom — how K8s/ECS surface cloud secret
   managers to code without SDK coupling).

First hit wins, per secret name. Values never appear in ``repr``/
``str`` (masked), the property Airflow connections gave the
reference. Lookup is lazy and cached per provider instance; a missing
secret raises ``KeyError`` with the chain that was searched — loud,
like the reference's SecretsManager error, never a silent None.
"""

from __future__ import annotations

import json
import os


class Secrets:
    """Named-secret provider chain (explicit > env > secrets file)."""

    ENV_PREFIX = "YTSPARK_SECRET_"
    FILE_VAR = "YTSPARK_SECRETS_FILE"

    def __init__(self, overrides: dict[str, dict] | None = None):
        self._overrides = dict(overrides or {})
        self._cache: dict[str, dict] = {}

    def resolve(self, name: str) -> dict:
        """The JSON blob for ``name``, from the first provider that
        has it. Raises KeyError listing the searched chain."""
        if name in self._cache:
            return dict(self._cache[name])
        blob = self._overrides.get(name)
        if blob is None:
            raw = os.environ.get(f"{self.ENV_PREFIX}{name}")
            if raw is not None:
                blob = json.loads(raw)
        if blob is None:
            path = os.environ.get(self.FILE_VAR)
            if path and os.path.exists(path):
                with open(path) as fh:
                    blob = json.load(fh).get(name)
        if blob is None:
            raise KeyError(
                f"secret '{name}' not found (searched: overrides, "
                f"${self.ENV_PREFIX}{name}, ${self.FILE_VAR})"
            )
        self._cache[name] = blob
        # return a copy: a caller mutating the blob (e.g. popping the
        # password after use) must not corrupt later resolutions
        return dict(blob)

    # -- reference-parity accessors --------------------------------

    def youtube_api_key(self) -> str:
        """Secret ``googleAPI`` -> ``api_key``
        (``dags/extract.py:140-145``)."""
        return self.resolve("googleAPI")["api_key"]

    def warehouse_jdbc(self) -> dict:
        """Secret ``warehouse`` -> url/user/password/driver — the
        JDBC twin of the reference's ``snowflake_data`` blob
        (``dags/extract.py:47-60``)."""
        return self.resolve("warehouse")

    def __repr__(self) -> str:  # never leak values
        known = sorted(
            set(self._overrides)
            | {
                k[len(self.ENV_PREFIX):]
                for k in os.environ
                if k.startswith(self.ENV_PREFIX)
            }
        )
        return f"Secrets(names={known}, values=***)"
