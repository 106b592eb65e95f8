from .prompts import PromptDataset, InfinitePromptIterator, read_prompt_file
from .mscoco import CocoCaptionDataset
from .latents import LatentDataset, InfiniteLatentIterator

__all__ = [
    "PromptDataset",
    "InfinitePromptIterator",
    "read_prompt_file",
    "CocoCaptionDataset",
    "LatentDataset",
    "InfiniteLatentIterator",
]
