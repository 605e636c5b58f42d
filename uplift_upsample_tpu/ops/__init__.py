"""Compute kernels: attention (XLA and Pallas paths), batched camera projection."""
