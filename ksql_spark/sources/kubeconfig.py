"""kubeconfig resolution + TLS client config for live k8s mode.

Parity with the reference's connect path (ksql.js:43-126):
  * read ``~/.kube/config`` (or ``$KUBECONFIG``), resolve ``current-context``
    → context → cluster + user (ksql.js:98-105, findByName at :34-41);
  * decode base64 ``certificate-authority-data`` / ``client-certificate-data``
    / ``client-key-data`` into ca/cert/key PEM (ksql.js:108-114);
  * https without a client cert+key is an error (clientFromURL, ksql.js:46-48)
    — unless a bearer token is present (documented divergence: token-auth
    clusters are common and the reference's Client would reject them);
  * a user token is attached unless it is the literal ``'none'``
    (ksql.js:118-121);
  * missing kubeconfig → interactive "Server URL: " prompt (promptForClient,
    ksql.js:67-85); any other read error propagates (ksql.js:89-94).

Divergence from the reference (improvements, documented): the file-path
variants (``certificate-authority`` etc.) real kubeconfigs use are also
honored, and the resolution happens ONCE on the driver — the resolved PEMs are
shipped to executors as DataSource options, so workers never need the file.
"""

from __future__ import annotations

import base64
import os
import ssl
import tempfile
from dataclasses import dataclass
from pathlib import Path
from typing import Callable, Optional


@dataclass
class ClientConfig:
    server: str
    ca_pem: Optional[bytes] = None
    cert_pem: Optional[bytes] = None
    key_pem: Optional[bytes] = None
    token: Optional[str] = None

    def require_transport_auth(self) -> "ClientConfig":
        """clientFromURL parity (ksql.js:46-48): https needs a client cert+key
        (or, our documented divergence, a bearer token). Enforced on the
        kubeconfig/prompt connect path only — an explicit server= option may
        legitimately target an authenticating proxy with plain verified TLS."""
        scheme = self.server.split("://", 1)[0].lower()
        if scheme == "https" and not (self.cert_pem and self.key_pem) and not self.token:
            raise TypeError(
                "you must provide a client certificate and key if you use "
                "https transport"
            )
        return self

    def ssl_context(self) -> Optional[ssl.SSLContext]:
        if not self.server.lower().startswith("https"):
            return None
        ctx = ssl.create_default_context()
        if self.ca_pem:
            ctx.load_verify_locations(cadata=self.ca_pem.decode())
        if self.cert_pem and self.key_pem:
            # ssl can only load a client chain from files → short-lived 0600
            # temp files, removed as soon as the context holds the keys
            cert_f = key_f = None
            try:
                with tempfile.NamedTemporaryFile(delete=False) as f:
                    os.fchmod(f.fileno(), 0o600)
                    f.write(self.cert_pem)
                    cert_f = f.name
                with tempfile.NamedTemporaryFile(delete=False) as f:
                    os.fchmod(f.fileno(), 0o600)
                    f.write(self.key_pem)
                    key_f = f.name
                ctx.load_cert_chain(certfile=cert_f, keyfile=key_f)
            finally:
                for p in (cert_f, key_f):
                    if p:
                        os.unlink(p)
        return ctx


def _by_name(entries: list, name: str) -> Optional[dict]:
    """findByName (ksql.js:34-41)."""
    for e in entries or []:
        if e.get("name") == name:
            return e
    return None


def _pem(section: dict, data_key: str, path_key: str,
         base_dir: Optional[Path] = None) -> Optional[bytes]:
    if section.get(data_key):
        return base64.b64decode(section[data_key])
    if section.get(path_key):
        p = Path(section[path_key]).expanduser()
        if not p.is_absolute() and base_dir is not None:
            # kubectl resolves relative cert paths against the kubeconfig's
            # own directory, not the process CWD
            p = base_dir / p
        return p.read_bytes()
    return None


def default_kubeconfig_path() -> Path:
    env = os.environ.get("KUBECONFIG")
    return Path(env) if env else Path.home() / ".kube" / "config"


def load_kubeconfig(path: str | os.PathLike | None = None) -> Optional[ClientConfig]:
    """Resolve a kubeconfig file to a ClientConfig; None if the file is absent
    (caller decides whether to prompt — ksql.js:89-94 ENOENT branch)."""
    import yaml

    p = Path(path) if path else default_kubeconfig_path()
    try:
        doc = yaml.safe_load(p.read_text())
    except FileNotFoundError:
        return None
    if not isinstance(doc, dict):
        # empty or comments-only file: a clean error beats an AttributeError
        # (kubectl also errors here rather than treating it as absent)
        raise ValueError(f"kubeconfig {p} is empty or not a YAML mapping")
    context_name = doc.get("current-context")
    context = _by_name(doc.get("contexts"), context_name)
    if context is None:
        raise ValueError(f"kubeconfig has no context named {context_name!r}")
    cluster = _by_name(doc.get("clusters"), context["context"]["cluster"])
    if cluster is None:
        raise ValueError(
            f"kubeconfig has no cluster named {context['context']['cluster']!r}"
        )
    user = _by_name(doc.get("users"), context["context"].get("user"))

    base = p.parent
    ca = _pem(cluster["cluster"], "certificate-authority-data",
              "certificate-authority", base)
    cert = key = None
    token = None
    if user:
        u = user.get("user", {})
        cert = _pem(u, "client-certificate-data", "client-certificate", base)
        key = _pem(u, "client-key-data", "client-key", base)
        # ksql.js:118-121 — 'none' is the reference's explicit no-token marker
        if u.get("token") and u["token"] != "none":
            token = u["token"]
    return ClientConfig(
        server=cluster["cluster"]["server"],
        ca_pem=ca,
        cert_pem=cert,
        key_pem=key,
        token=token,
    ).require_transport_auth()


def prompt_for_server(input_fn: Callable[[str], str] = input) -> ClientConfig:
    """promptForClient parity (ksql.js:67-85): ask for a plain server URL.
    An https answer with no credentials errors like clientFromURL would."""
    return ClientConfig(server=input_fn("Server URL: ").strip()).require_transport_auth()


def resolve_client(
    path: str | os.PathLike | None = None,
    prompt: bool = True,
    input_fn: Callable[[str], str] = input,
) -> ClientConfig:
    """connect() parity (ksql.js:87-126): kubeconfig if present, else prompt."""
    cfg = load_kubeconfig(path)
    if cfg is not None:
        return cfg
    if not prompt:
        raise FileNotFoundError(
            f"no kubeconfig at {path or default_kubeconfig_path()}"
        )
    return prompt_for_server(input_fn)
