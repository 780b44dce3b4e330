"""Evaluation: COCO-style AP metrics, AP-vs-IoU curves."""
