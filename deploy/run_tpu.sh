#!/usr/bin/env bash
# Launch the serving container on a TPU VM (parity with the reference's
# `run_docker.sh`, minus the CUDA specifics).
#
# Usage: ./deploy/run_tpu.sh [MODEL_DIR] [PORT]
set -euo pipefail

MODEL_DIR="${1:-$PWD/models}"
PORT="${2:-8000}"
IMAGE="${IMAGE:-voice-tts-tpu}"
NAME="${NAME:-voice-tts-tpu}"

if [ ! -d "$MODEL_DIR" ]; then
    echo "model dir $MODEL_DIR not found (convert checkpoints first:" >&2
    echo "  python -m voice_tts_tpu.utils.artifacts --help)" >&2
    exit 1
fi

docker rm -f "$NAME" 2>/dev/null || true

# --privileged + /dev device passthrough expose the TPU chips to the
# container (the TPU equivalent of the reference's `--gpus all`)
exec docker run -d \
    --name "$NAME" \
    --restart unless-stopped \
    --privileged \
    --device /dev/accel0 \
    -p "$PORT:8000" \
    -v "$MODEL_DIR":/models:ro \
    -v voice-tts-tpu-cache:/cache \
    -e TPU_NAME="${TPU_NAME:-local}" \
    "$IMAGE"
