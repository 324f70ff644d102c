# Containerized single-MRI prediction (the deployment contract the reference
# README describes but never ships — /root/reference/README.md:127-173):
#   input : /input/*_{flair,t1,t1ce,t2}.nii.gz  (one co-registered MRI)
#   output: /output/<id>.nii.gz                 (BraTS-labelled segmentation)
#
# Build:  docker build -t gnn-tumor-seg-tpu .
# Run:    docker run --rm -v /path/to/mri:/input -v /path/to/out:/output \
#             gnn-tumor-seg-tpu
# Weights are baked in from weights/ (gnn.ckpt, cnn.ckpt) — train them with the
# pipeline CLIs and copy into weights/ before building.

FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends g++ \
    && rm -rf /var/lib/apt/lists/*

RUN pip install --no-cache-dir "jax[cpu]" optax scipy numpy

WORKDIR /app
COPY gnn_tumor_seg_tpu/ gnn_tumor_seg_tpu/
COPY native/ native/
COPY weights/ weights/

# pre-build the native preprocessing kernels
RUN python native/build.py

ENV PYTHONPATH=/app

# bake a hot XLA persistent cache: pre-compiles the serve-path programs
# (GNN forward, SLIC device program, gather/bbox, CNN at the warmup bucket)
# so per-request cold start pays no avoidable compiles.
# NOTE: the persistent cache is keyed per platform/config — entries baked here
# with this image's jax[cpu] only hit on CPU serve hosts. On a TPU serve host,
# run the same warmup command ONCE on that machine after deploy (the cache is
# per-machine, so it is a one-time cost, not per-request); `|| true` keeps
# image builds alive where warmup cannot run.
RUN python -m gnn_tumor_seg_tpu.cli.warmup \
        -g /app/weights/gnn.ckpt -c /app/weights/cnn.ckpt || true
ENTRYPOINT ["python", "-m", "gnn_tumor_seg_tpu.cli.predict_single", \
            "-i", "/input", "-o", "/output", \
            "-g", "/app/weights/gnn.ckpt", "-c", "/app/weights/cnn.ckpt"]
