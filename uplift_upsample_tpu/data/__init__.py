"""Datasets, joint vocabularies, camera math, and sequence window generators."""
