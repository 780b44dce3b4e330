"""Application layer: serving, inference, validation, calibration,
thresholding, auto-labeling, active learning, SSL."""
