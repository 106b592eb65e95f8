from .prompts import PromptDataset, InfinitePromptIterator, read_prompt_file
from .mscoco import CocoCaptionDataset

__all__ = [
    "PromptDataset",
    "InfinitePromptIterator",
    "read_prompt_file",
    "CocoCaptionDataset",
]
