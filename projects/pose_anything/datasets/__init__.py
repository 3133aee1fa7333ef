from .fewshot import FewShotKeypointDataset, collate_episodes

__all__ = ["FewShotKeypointDataset", "collate_episodes"]
