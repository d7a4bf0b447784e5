from .torch_loader import load_torch_state_dict, load_openai_clip_state_dict, load_dassl_checkpoint
from .convert import (
    cascade_key_map,
    clip_key_map,
    convert_state_dict,
    convert_cascade_checkpoint,
    convert_sam_backbone,
    convert_openai_clip,
    convert_maple_prompt_learner,
)
from .checkpoint import save_checkpoint, restore_checkpoint
