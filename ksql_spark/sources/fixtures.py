"""Deterministic K8s-object JSON fixtures (FIXTURES.md §2).

Shaped like Kubernetes API list responses — {"items": [...]} — exactly the
form the reference consumes (ksql.js:198 `pods[0].items`, ksql.js:230
`result[0].items`). Small fixed topology: 3 nodes, 20 pods (1-3 containers
each), 5 services. Includes the edge cases the reference queries exercise:
mysql:5.5 / mysql:5.6 / other images (README.md:21,30), pods with and without
an `annotations.email` (README.md:34), and a missing restartCount
(the ksql.js:204-211 bug case — SURVEY §1.4).
"""

from __future__ import annotations

import json
from pathlib import Path

FIXTURE_DIR = Path(__file__).parent / "k8s_fixtures"

_IMAGES = ["mysql:5.5", "mysql:5.6", "nginx:1.19", "redis:6.0", "app:v2"]


def _ts(i: int) -> str:
    return f"2024-03-{(i % 27) + 1:02d}T{(i * 7) % 24:02d}:00:00Z"


def build_pods() -> dict:
    items = []
    for i in range(20):
        n_containers = (i % 3) + 1
        containers = []
        statuses = []
        for j in range(n_containers):
            image = _IMAGES[(i * 3 + j) % len(_IMAGES)]
            containers.append({"name": f"c{j}", "image": image})
            status: dict = {"name": f"c{j}"}
            # pod 7's first container: missing restartCount (reference bug case)
            if not (i == 7 and j == 0):
                status["restartCount"] = (i * 5 + j * 3) % 9
            statuses.append(status)
        annotations = {"team": f"team-{i % 4}"}
        if i % 3 == 0:
            annotations["email"] = f"owner{i}@example.com"
        items.append(
            {
                "metadata": {
                    "name": f"pod-{i}",
                    "namespace": "default" if i % 4 else "kube-system",
                    "uid": f"pod-uid-{i:04d}",
                    "creationTimestamp": _ts(i),
                    "labels": {"app": f"app-{i % 5}", "tier": ["web", "db", "cache"][i % 3]},
                    "annotations": annotations,
                },
                "spec": {"nodeName": f"node-{i % 3}", "containers": containers},
                "status": {
                    "phase": ["Running", "Pending", "Succeeded"][i % 3 if i % 7 else 0],
                    "containerStatuses": statuses,
                },
            }
        )
    return {"kind": "PodList", "items": items}


def build_nodes() -> dict:
    items = []
    for i in range(3):
        items.append(
            {
                "metadata": {
                    "name": f"node-{i}",
                    "namespace": "",
                    "uid": f"node-uid-{i:04d}",
                    "creationTimestamp": _ts(i),
                    "labels": {"zone": f"zone-{i % 2}"},
                },
                "spec": {"podCIDR": f"10.0.{i}.0/24", "unschedulable": i == 2},
                "status": {
                    "capacity": {"cpu": str(4 + 4 * i), "memory": f"{8 * (i + 1)}Gi"},
                    "conditions": [{"type": "Ready", "status": "True" if i < 2 else "False"}],
                },
            }
        )
    return {"kind": "NodeList", "items": items}


def build_services() -> dict:
    items = []
    for i in range(5):
        items.append(
            {
                "metadata": {
                    "name": f"svc-{i}",
                    "namespace": "default",
                    "uid": f"svc-uid-{i:04d}",
                    "creationTimestamp": _ts(i + 40),
                    "labels": {"app": f"app-{i}"},
                },
                "spec": {
                    "clusterIP": f"10.96.0.{i + 1}",
                    "type": "ClusterIP" if i % 2 == 0 else "NodePort",
                    "ports": [{"port": 80 + i, "protocol": "TCP"}],
                },
                "status": {},
            }
        )
    return {"kind": "ServiceList", "items": items}


_BUILDERS = {"pods": build_pods, "nodes": build_nodes, "services": build_services}


def ensure_fixtures(target: Path | None = None) -> Path:
    """Write fixture JSON files (idempotent; content is deterministic)."""
    target = target or FIXTURE_DIR
    target.mkdir(parents=True, exist_ok=True)
    for kind, build in _BUILDERS.items():
        path = target / f"{kind}.json"
        payload = json.dumps(build(), indent=1, sort_keys=True)
        if not path.exists() or path.read_text() != payload:
            path.write_text(payload)
    return target
