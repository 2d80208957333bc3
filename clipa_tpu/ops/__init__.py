"""TPU compute ops: attention cores, fused preprocessing, chunked InfoNCE."""
