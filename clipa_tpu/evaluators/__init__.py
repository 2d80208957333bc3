"""Evaluators: zero-shot classification, retrieval, contrastive health."""
