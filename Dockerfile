# Serving image for the TPU-native TTS framework.
#
# Deployment parity with the reference's CUDA image (`Dockerfile` +
# `run_docker.sh` there): one container per host, one engine replica per TPU
# chip inside the server process (replacing gunicorn fork + per-GPU
# CUDA_VISIBLE_DEVICES pinning with in-process replicas over jax.devices()).
#
# Build:  docker build -t voice-tts-tpu .
# Run  :  see deploy/run_tpu.sh (requires a TPU VM host; --privileged and
#         /dev/accel* passthrough are what `--gpus all` is to the reference).

FROM python:3.12-slim

ENV PYTHONUNBUFFERED=1 \
    JAX_PLATFORMS=tpu \
    # persistent XLA compile cache across container restarts (mount a volume)
    JAX_COMPILATION_CACHE_DIR=/cache/jax

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml README.md ./
COPY voice_tts_tpu ./voice_tts_tpu
COPY native ./native

# TPU-enabled jax wheel + the package; libtpu comes from the jax[tpu] extra
RUN pip install --no-cache-dir "jax[tpu]" \
        -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    && pip install --no-cache-dir . \
    # build the native text-normalization core
    && g++ -O2 -shared -fPIC -o native/libtn_core.so native/tn_core.cpp

# converted model artifacts are mounted, not baked (multi-GB)
VOLUME ["/models", "/cache"]

EXPOSE 8000
HEALTHCHECK --interval=30s --timeout=5s --start-period=300s \
    CMD python -c "import urllib.request,sys; \
        sys.exit(0 if b'healthy' in urllib.request.urlopen('http://localhost:8000/health', timeout=3).read() else 1)"

CMD ["voice-tts-tpu-server", "--host", "0.0.0.0", "--port", "8000", \
     "--model-dir", "/models"]
