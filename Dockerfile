# Reproducible environment for the udal_tpu framework (TPU-native rebuild of
# continental/uncertainty-detection-autolabeling — ref Dockerfile:1-32 uses
# an nvidia/cuda base; this targets Cloud TPU VMs instead).
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        build-essential g++ make libgl1 libglib2.0-0 && \
    rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml README.md ./
COPY udal_tpu ./udal_tpu
COPY native ./native
COPY configs ./configs
COPY tests ./tests

# jax[tpu] pulls libtpu on TPU VMs; CPU fallback works everywhere else
RUN pip install --no-cache-dir \
        "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html || \
    pip install --no-cache-dir jax
RUN pip install --no-cache-dir \
        flax optax orbax-checkpoint chex einops numpy scipy scikit-learn \
        opencv-python-headless pyyaml matplotlib pillow pytest && \
    pip install --no-cache-dir -e .

# build the native TFRecord IO library
RUN make -C native || true

ENTRYPOINT ["udal_tpu"]
CMD ["--help"]
