from .pipeline import (DataLoader, Subset, PatchQueue, batched,
                       default_collate, prefetch_to_device)

__all__ = ["DataLoader", "Subset", "PatchQueue", "batched",
           "default_collate", "prefetch_to_device"]
