from .pipeline import DataLoader, Subset, PatchQueue, default_collate, prefetch_to_device

__all__ = ["DataLoader", "Subset", "PatchQueue", "default_collate",
           "prefetch_to_device"]
