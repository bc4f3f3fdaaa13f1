"""Task-1 CLI — offline multimodal item-embedding generation as a real tool.

The reference runs Task 1 as a notebook (Notebooks/task-1.ipynb): assemble
"{title} | tags: ... | likes_level: x | views_level: y" text per item, probe
the image directory (jpg/png/jpeg/webp + glob, black 224x224 placeholder),
encode text+image through ViLT (dandelin/vilt-b32-mlm, CLS token,
L2-normalized), PCA to 128 dims, re-L2-normalize, and write the refreshed
``item_emb_d128`` column. This CLI drives the same pipeline
(tools/item_embeddings.py); when HF weights are unavailable (zero-egress
environments) ``--encoder hash`` substitutes the deterministic n-gram hash
encoder so the output contract is still exercised end to end.
"""

from __future__ import annotations

import argparse


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Generate multimodal item embeddings")
    p.add_argument("--item-feature", required=True, help="input item_feature.parquet")
    p.add_argument("--output", required=True, help="output item_info parquet")
    p.add_argument("--image-dir", default=None, help="raw item images ({item_id}.ext)")
    p.add_argument("--encoder", choices=("vilt", "hash"), default="vilt")
    p.add_argument("--dims", type=int, default=128)
    p.add_argument("--vilt-model", default="dandelin/vilt-b32-mlm")
    p.add_argument("--batch-size", type=int, default=16)
    args = p.parse_args(argv)

    from ctr_recommendation_tpu.tools.item_embeddings import (
        HashTextEncoder,
        ViltEncoder,
        generate_item_embeddings,
    )

    if args.encoder == "vilt":
        try:
            encoder = ViltEncoder(args.vilt_model, batch_size=args.batch_size)
        except Exception as e:  # no weights / no transformers in this env
            print(f"[warn] ViLT unavailable ({e!r}); falling back to hash encoder")
            encoder = HashTextEncoder()
    else:
        encoder = HashTextEncoder()

    n = generate_item_embeddings(
        args.item_feature,
        args.output,
        encoder=encoder,
        n_components=args.dims,
        image_dir=args.image_dir,
    )
    print(f"[out] {args.output}: {n} items, {args.dims}-d item_emb_d128")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
