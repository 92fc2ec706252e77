"""fedfr_tpu — a TPU-native (JAX/XLA/Pallas) federated face-recognition framework.

Re-designed from scratch with the capabilities of FedFR (AAAI 2022,
jackie840129/FedFR): sphnet/iresnet embedding backbones, CosFace/ArcFace
margin-softmax training, a class-sharded partial-FC softmax expressed as
sharded XLA collectives, a 40-client FedAvg simulation with personalized BCE
"transformation layer" branches, MOON-style contrastive regularization,
hard-negative public-data mining, SpreadOut class-center aggregation, and the
full evaluation suite (LFW/AgeDB ``.bin`` pair verification, IJB-C 1:1/1:n,
per-client personalized 1:1/1:n with an all-pairs cosine ROC histogram).

Layout:
    data/       RecordIO codec, datasets, host->device input pipeline
    models/     flax backbones + heads (functional, pytree state)
    ops/        margins/losses, k-fold verification math, ROC histogram kernels
    parallel/   device mesh, class-sharded partial FC, FedAvg/SpreadOut
    federated/  client/server engine (pure-function train steps)
    evalsuite/  .bin / IJB-C / personalized local evaluation
    utils/      logging, metrics, checkpoint interop (torch .pth <-> pytree)
    native/     C++ data-plane (threaded RecordIO + JPEG decode)
"""

__version__ = "0.1.0"
