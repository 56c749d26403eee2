#!/usr/bin/env bash
# Bring up the web platform (reference scripts/deploy.sh equivalent).
#   ./deploy.sh up    — build + start the stack
#   ./deploy.sh down  — stop
#   ./deploy.sh logs  — follow logs
set -euo pipefail
cd "$(dirname "$0")"
case "${1:-up}" in
  up)   docker compose up --build -d ;;
  down) docker compose down ;;
  logs) docker compose logs -f ;;
  *) echo "usage: $0 {up|down|logs}" >&2; exit 1 ;;
esac
