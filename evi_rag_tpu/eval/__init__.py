"""Evaluation: ranking metrics, reachability, artifact pipeline, reasoner."""
