#!/bin/sh
# Per-example acceptance targets — the TPU build's analog of the
# reference's one-%apprun-per-example singularity harness
# (/root/reference/container/singularity/ETOL-examples.def).
set -e
cmd="${1:-all}"
shift 2>/dev/null || true
case "$cmd" in
  ocp)    exec etol-solve-ocp "$@" ;;
  mip)    exec etol-solve-mip "$@" ;;
  exact)  exec etol-solve-exact "$@" ;;
  3d)     exec etol-solve-3d "$@" ;;
  mpc)    exec etol-mpc-demo "$@" ;;
  fleet)  exec etol-fleet "$@" ;;
  bench)  exec etol-bench "$@" ;;
  tests)  exec python -m pytest tests/ -q ;;
  all)
    etol-solve-ocp
    etol-solve-mip
    etol-solve-exact
    etol-solve-3d
    etol-mpc-demo 5
    etol-fleet 64
    exec python -m pytest tests/ -q
    ;;
  *)
    echo "usage: etol-example {ocp|mip|exact|3d|mpc|fleet|bench|tests|all}" >&2
    exit 2
    ;;
esac
