"""Input pipeline: TFRecord IO, example parsing, augmentation, labeling."""
