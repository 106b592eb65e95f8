"""Build the committed tiny HF-format checkpoint fixture + golden outputs.

Run once (committed artifacts; reproducible):

    env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tests/fixtures/make_tiny_ckpt.py

Writes ``tiny_hf_ckpt/{unet,vae,text_encoder}/*.safetensors`` in the HF
diffusers/transformers key layout (via the export_* mappers) plus
``golden.npz`` with pinned generation outputs.  The fixture locks the
``models/convert.py`` import path + module semantics beyond self-goldens
(VERDICT r2 #6): any layout/transpose mutation in the converter changes the
loaded params and fails ``test_checkpoint_fixture.py`` against these pinned
bytes — the fixture itself is committed, so later converter edits cannot
re-bake it silently.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))


def main():
    import jax
    import jax.numpy as jnp
    from safetensors.numpy import save_file

    jax.config.update("jax_default_matmul_precision", "highest")

    from sid_lsg_tpu.diffusion.rng import seeded_latents
    from sid_lsg_tpu.models.configs import TINY
    from sid_lsg_tpu.models.convert import export_clip_text, export_unet, export_vae
    from sid_lsg_tpu.pipeline import SDPipeline

    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "tiny_hf_ckpt")
    pipe = SDPipeline.random_init("tiny", seed=123)

    f16 = lambda sd: {k: np.ascontiguousarray(v, dtype=np.float16)
                      for k, v in sd.items()}
    os.makedirs(os.path.join(out_dir, "unet"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "vae"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "text_encoder"), exist_ok=True)
    save_file(f16(export_unet(pipe.params["unet"], TINY.unet)),
              os.path.join(out_dir, "unet", "diffusion_pytorch_model.safetensors"))
    save_file(f16(export_vae(pipe.params["vae"], TINY.vae)),
              os.path.join(out_dir, "vae", "diffusion_pytorch_model.safetensors"))
    save_file(f16(export_clip_text(pipe.params["text"], TINY.text)),
              os.path.join(out_dir, "text_encoder", "model.safetensors"))

    # HF-layout config jsons so SDPipeline.from_pretrained builds the
    # architecture from the checkpoint itself (config_from_hf_json), exactly
    # as it will on a real SD checkpoint directory.
    from sid_lsg_tpu.models.configs import write_hf_config_jsons

    write_hf_config_jsons(out_dir, TINY)

    # Goldens must come from the f16-rounded weights actually in the files.
    from sid_lsg_tpu.models.convert import load_sd_checkpoint

    unet_p, vae_p, text_p = load_sd_checkpoint(out_dir, TINY)
    pipe2 = SDPipeline(TINY, {"unet": unet_p, "vae": vae_p, "text": text_p},
                       pipe.tokenizer)
    prompts = ["a cat", "a photo of a dog"]
    lat = seeded_latents([0, 1], TINY.unet.sample_size, TINY.unet.in_channels)
    emb = pipe2.encode_prompts(prompts)
    x0 = pipe2.generate_latents(jnp.asarray(lat), emb)
    imgs = pipe2.decode(x0)
    np.savez(
        os.path.join(out_dir, "golden.npz"),
        prompts=np.array(prompts),
        latents=np.asarray(lat, np.float32),
        emb=np.asarray(emb, np.float32),
        x0=np.asarray(x0, np.float32),
        images=np.asarray(imgs),
    )
    print("fixture written to", out_dir)
    print("x0 stats:", float(jnp.mean(x0)), float(jnp.std(x0)))


if __name__ == "__main__":
    main()
