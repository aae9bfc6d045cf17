"""Utilities: logging, metrics/TensorBoard, image export, torch interop."""
