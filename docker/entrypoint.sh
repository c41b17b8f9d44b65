#!/bin/sh
# Service selector: SERVICE=clip|search|disk|all (default all-small-scale)
set -e
cd /app
export PYTHONPATH=/app

case "${SERVICE:-all}" in
  clip)
    exec python -m meme_search_engine_tpu.serving.clip_server \
        "${CONFIG:-configs/clip_config.json}"
    ;;
  search)
    exec python -m meme_search_engine_tpu.serving.query_server \
        "${CONFIG:-configs/mse_config.json}"
    ;;
  disk)
    exec python -m meme_search_engine_tpu.serving.disk_query_server \
        "${CONFIG:-configs/disk_config.json}"
    ;;
  all)
    python -m meme_search_engine_tpu.serving.clip_server \
        "${CLIP_CONFIG:-configs/clip_config.json}" &
    python -m meme_search_engine_tpu.serving.query_server \
        "${CONFIG:-configs/mse_config.json}" &
    exec nginx -g "daemon off;"
    ;;
  *)
    echo "unknown SERVICE: ${SERVICE}" >&2
    exit 1
    ;;
esac
