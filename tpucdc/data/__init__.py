"""L7 data: eval-set loaders and the training crop pipeline (SURVEY.md §1.2 L7)."""

from tpucdc.data.datasets import (eval_dataset, kodak, clic2020, tecnick,
                                  synthetic_images, train_crop_iterator)

__all__ = ["eval_dataset", "kodak", "clic2020", "tecnick",
           "synthetic_images", "train_crop_iterator"]
