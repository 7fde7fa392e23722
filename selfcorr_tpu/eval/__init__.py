"""Evaluation: on-device pose fitting, exact 3D IoU, NOCS/CUB metrics."""
