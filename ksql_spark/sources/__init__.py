"""Sources: the `k8s` Python DataSource (snapshot reads of Kubernetes object
lists, fixture- or live-mode) — SURVEY.md §1.4 / §7 stage 3."""
