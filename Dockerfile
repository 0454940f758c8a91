# Reproducible environment for radargnn_tpu.
#
# Capability parity with the reference's Dockerfile
# (/root/reference/Dockerfile:1-30 — pinned pytorch+PyG+detectron2 CUDA
# stack), re-based for the TPU-native stack: pinned jax/flax/optax/orbax
# wheels plus the g++ toolchain that builds the native host kernels
# (radargnn_tpu/native/geometry.cpp, compiled on first import via ctypes).
#
# CPU base image: unit tests and the virtual-8-device mesh tests run
# anywhere; on a TPU VM swap the jax pin for the matching `jax[tpu]` wheel
# (-f https://storage.googleapis.com/jax-releases/libtpu_releases.html).

FROM python:3.12-slim

ARG DEBIAN_FRONTEND=noninteractive
ARG PIP_ROOT_USER_ACTION=ignore

# g++ builds the native host kernels; git for pip VCS deps if ever needed
RUN apt-get update && apt-get install -y --no-install-recommends \
    g++ \
    gcc \
    make \
    git \
    && rm -rf /var/lib/apt/lists/*

RUN python3 -m pip install --upgrade pip

# pinned compute stack (versions this repo is developed/tested against)
RUN python3 -m pip install --no-cache-dir \
    "jax==0.9.0" \
    "jaxlib==0.9.0" \
    "flax==0.12.3" \
    "optax==0.2.6" \
    "orbax-checkpoint==0.11.32" \
    "chex==0.1.91" \
    "einops==0.8.2" \
    "numpy==2.0.2" \
    "matplotlib" \
    "pyyaml" \
    "h5py" \
    "scikit-learn" \
    "pytest"

COPY ./radargnn_tpu /app/radargnn_tpu
COPY ./pyproject.toml /app/
COPY ./configurations /app/configurations
COPY ./tests /app/tests
COPY ./benchmarks /app/benchmarks
COPY ./bench.py /app/

WORKDIR /app
# the [eval] extra pulls the official nuscenes-devkit so the
# devkit-differential test (tests/test_nuscenes_devkit_differential.py)
# runs for real in this image (it skips where the devkit is absent)
RUN python3 -m pip install --no-cache-dir -e ".[eval]"

# smoke: package imports and native kernels build
RUN python3 -c "import radargnn_tpu; from radargnn_tpu import native"

ENTRYPOINT ["/bin/bash"]
