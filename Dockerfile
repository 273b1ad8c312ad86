# deeprank2_tpu — CPU image (tests, featurization, tutorials).
#
# JAX's CPU backend runs the full framework, including the multi-chip
# sharding paths over virtual devices (how the test suite exercises them).
# For TPU hosts, install the matching accelerator wheel instead:
#   pip install -U "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
FROM python:3.12-slim

RUN apt-get update && \
    apt-get install --no-install-recommends --yes g++ make && \
    rm -rf /var/lib/apt/lists/*

WORKDIR /opt/deeprank2_tpu
COPY pyproject.toml README.md ./
COPY deeprank2_tpu ./deeprank2_tpu
COPY tutorials ./tutorials
COPY tests ./tests

RUN pip install --no-cache-dir -e . && \
    pip install --no-cache-dir pytest ml_dtypes && \
    # pre-build the optional native kernels (numpy fallbacks cover a failure)
    python -c "from deeprank2_tpu import csrc; csrc.load()" || true

# smoke: the tutorial scripts run end to end in demo mode
RUN python -m pytest tests/test_tutorials.py -q

CMD ["python", "-c", "import deeprank2_tpu; print('deeprank2_tpu ready')"]
