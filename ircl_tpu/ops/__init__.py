"""TPU compute kernels: ragged sparse scoring, BiLSTM scan, k-means, top-k."""
