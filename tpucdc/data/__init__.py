"""L7 data: eval-set loaders and the training crop pipeline (SURVEY.md §1.2 L7)."""

from tpucdc.data.datasets import (eval_dataset, kodak, clic2020, tecnick,
                                  local_image_corpus, synthetic_images,
                                  synthetic_images_rich, training_corpus,
                                  train_crop_iterator)

__all__ = ["eval_dataset", "kodak", "clic2020", "tecnick",
           "local_image_corpus", "synthetic_images", "synthetic_images_rich",
           "training_corpus", "train_crop_iterator"]
