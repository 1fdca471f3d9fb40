"""kubeconfig resolution + live-mode mTLS tests (connect parity, ksql.js:43-126).

The https stub is a real TLS server requiring a client certificate (generated
in-process with `cryptography`), so the x509 path is exercised end-to-end:
kubeconfig → base64 PEM options → executor-side ssl context → API GET.
"""

from __future__ import annotations

import base64
import datetime as dt
import json
import ssl
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from ksql_spark.sources.kubeconfig import (
    ClientConfig,
    load_kubeconfig,
    prompt_for_server,
    resolve_client,
)


def _b64(b: bytes) -> str:
    return base64.b64encode(b).decode()


def _make_kubeconfig(tmp_path, server: str, ca=None, cert=None, key=None,
                     token=None, user_extra=""):
    user_block = ""
    if cert:
        user_block += f"    client-certificate-data: {_b64(cert)}\n"
    if key:
        user_block += f"    client-key-data: {_b64(key)}\n"
    if token:
        user_block += f"    token: {token}\n"
    ca_line = f"    certificate-authority-data: {_b64(ca)}\n" if ca else ""
    text = f"""\
apiVersion: v1
kind: Config
current-context: demo
contexts:
- name: other
  context: {{cluster: nope, user: nobody}}
- name: demo
  context: {{cluster: c1, user: u1}}
clusters:
- name: c1
  cluster:
    server: {server}
{ca_line}users:
- name: u1
  user:
{user_block or '    {}'}
"""
    p = tmp_path / "config"
    p.write_text(text)
    return p


def test_load_kubeconfig_resolves_current_context(tmp_path):
    p = _make_kubeconfig(tmp_path, "http://1.2.3.4:8080", token="tok123")
    cfg = load_kubeconfig(p)
    assert cfg.server == "http://1.2.3.4:8080"
    assert cfg.token == "tok123"
    assert cfg.ca_pem is None and cfg.cert_pem is None


def test_token_none_is_dropped(tmp_path):
    # ksql.js:118-121 — the literal 'none' means "no token"
    p = _make_kubeconfig(tmp_path, "http://1.2.3.4:8080", token="none")
    assert load_kubeconfig(p).token is None


def test_https_without_cert_or_token_raises(tmp_path):
    # clientFromURL parity (ksql.js:46-48)
    p = _make_kubeconfig(tmp_path, "https://1.2.3.4:6443")
    with pytest.raises(TypeError, match="client certificate"):
        load_kubeconfig(p)


def test_missing_kubeconfig_prompts(tmp_path):
    # promptForClient parity (ksql.js:67-85)
    cfg = resolve_client(tmp_path / "nope", prompt=True,
                         input_fn=lambda _: "http://10.0.0.1:8080\n")
    assert cfg.server == "http://10.0.0.1:8080"


def test_missing_kubeconfig_no_prompt_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        resolve_client(tmp_path / "nope", prompt=False)


def test_prompt_for_server():
    assert prompt_for_server(lambda _: "http://h:1").server == "http://h:1"


# --- mTLS end-to-end -------------------------------------------------------


def _gen_cert(cn: str, issuer_key=None, issuer_cert=None, is_ca=False):
    from cryptography import x509
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import rsa
    from cryptography.x509.oid import NameOID

    key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    name = x509.Name([x509.NameAttribute(NameOID.COMMON_NAME, cn)])
    now = dt.datetime.now(dt.timezone.utc)
    builder = (
        x509.CertificateBuilder()
        .subject_name(name)
        .issuer_name(issuer_cert.subject if issuer_cert else name)
        .public_key(key.public_key())
        .serial_number(x509.random_serial_number())
        .not_valid_before(now - dt.timedelta(minutes=5))
        .not_valid_after(now + dt.timedelta(hours=1))
        .add_extension(x509.BasicConstraints(ca=is_ca, path_length=None),
                       critical=True)
    )
    if not is_ca:
        builder = builder.add_extension(
            x509.SubjectAlternativeName(
                [x509.DNSName("localhost"),
                 x509.IPAddress(__import__("ipaddress").ip_address("127.0.0.1"))]
            ),
            critical=False,
        )
    cert = builder.sign(issuer_key or key, hashes.SHA256())
    key_pem = key.private_bytes(
        serialization.Encoding.PEM,
        serialization.PrivateFormat.TraditionalOpenSSL,
        serialization.NoEncryption(),
    )
    return key, cert, key_pem, cert.public_bytes(serialization.Encoding.PEM)


PODS_DOC = {
    "items": [
        {
            "metadata": {"uid": "mtls-pod-1", "name": "p1", "namespace": "default"},
            "spec": {"nodeName": "n1",
                     "containers": [{"name": "c", "image": "nginx:1"}]},
            "status": {"phase": "Running", "containerStatuses": []},
        }
    ]
}


@pytest.fixture(scope="module")
def mtls_server(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("mtls")
    ca_key, ca_cert, _, ca_pem = _gen_cert("test-ca", is_ca=True)
    _, _, srv_key_pem, srv_pem = _gen_cert("localhost", ca_key, ca_cert)
    _, _, cli_key_pem, cli_pem = _gen_cert("test-client", ca_key, ca_cert)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):  # noqa: N802
            body = json.dumps(PODS_DOC if "pods" in self.path
                              else {"items": []}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(body)

    srv_cert_f, srv_key_f, ca_f = tmp / "s.crt", tmp / "s.key", tmp / "ca.crt"
    srv_cert_f.write_bytes(srv_pem)
    srv_key_f.write_bytes(srv_key_pem)
    ca_f.write_bytes(ca_pem)
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    ctx.load_cert_chain(str(srv_cert_f), str(srv_key_f))
    ctx.load_verify_locations(str(ca_f))
    ctx.verify_mode = ssl.CERT_REQUIRED  # mTLS: client cert mandatory

    httpd = HTTPServer(("127.0.0.1", 0), Handler)
    httpd.socket = ctx.wrap_socket(httpd.socket, server_side=True)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield {"url": f"https://127.0.0.1:{port}", "ca": ca_pem,
           "cert": cli_pem, "key": cli_key_pem}
    httpd.shutdown()


def test_mtls_client_config_reaches_stub(mtls_server):
    import urllib.request

    cfg = ClientConfig(server=mtls_server["url"], ca_pem=mtls_server["ca"],
                       cert_pem=mtls_server["cert"], key_pem=mtls_server["key"])
    req = urllib.request.Request(f"{cfg.server}/api/v1/pods")
    with urllib.request.urlopen(req, context=cfg.ssl_context()) as resp:
        items = json.loads(resp.read())["items"]
    assert items[0]["metadata"]["uid"] == "mtls-pod-1"


def test_live_mode_kubeconfig_to_dataframe(spark, tmp_path, mtls_server):
    """Full path: kubeconfig file → resolve_client → DataSource options →
    executor ssl context → pods rows (connect parity, ksql.js:87-126)."""
    from ksql_spark.sources.k8s import load_k8s

    p = _make_kubeconfig(tmp_path, mtls_server["url"], ca=mtls_server["ca"],
                         cert=mtls_server["cert"], key=mtls_server["key"])
    client = resolve_client(p, prompt=False)
    rows = load_k8s(spark, "pods", client=client).collect()
    assert [r.uid for r in rows] == ["mtls-pod-1"]
    assert rows[0].node == "n1"


def test_explicit_server_option_https_is_not_strict():
    # the parity check applies to the kubeconfig/prompt connect path only; an
    # explicit server= option may target an authenticating proxy over plain TLS
    cfg = ClientConfig(server="https://proxy.example:443")
    assert cfg.server.startswith("https")
    with pytest.raises(TypeError):
        cfg.require_transport_auth()


def test_empty_kubeconfig_is_clean_error(tmp_path):
    p = tmp_path / "config"
    p.write_text("# just a comment\n")
    with pytest.raises(ValueError, match="empty"):
        load_kubeconfig(p)


def test_relative_cert_paths_resolve_against_config_dir(tmp_path):
    (tmp_path / "certs").mkdir()
    (tmp_path / "certs" / "ca.crt").write_bytes(b"CA PEM BYTES")
    p = tmp_path / "config"
    p.write_text("""\
apiVersion: v1
current-context: demo
contexts:
- name: demo
  context: {cluster: c1, user: u1}
clusters:
- name: c1
  cluster:
    server: http://1.2.3.4:8080
    certificate-authority: certs/ca.crt
users:
- name: u1
  user: {}
""")
    cfg = load_kubeconfig(p)
    assert cfg.ca_pem == b"CA PEM BYTES"
