# Pallas TPU kernels live here (see ensrf_pallas.py).
