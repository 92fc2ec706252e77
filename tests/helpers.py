"""Shared test plumbing (no RNG: synthetic data builders stay in their test
files because several tests assert learned separation on the exact draws)."""

import sys


def run_split_clis(src, out, *, num_client, num_id, imgs_per_id,
                   test_imgs=None, pub_ids=None):
    """Drive split_FL.py (and optionally split_pretrain.py) via their CLIs.

    Returns after both generators ran; callers rename split_pretrain_<n> to
    the split_pretrain_6000 layout themselves where needed.
    """
    import split_dataset.split_FL as sfl
    import split_dataset.split_pretrain as spre

    argv = sys.argv
    try:
        sys.argv = ["split_FL.py", "--data_dir", str(src),
                    "--output_dir", str(out),
                    "--num_client", str(num_client), "--num_ID", str(num_id),
                    "--min_imgs", str(imgs_per_id),
                    "--max_imgs", str(imgs_per_id)]
        if test_imgs is not None:
            sys.argv += ["--test_imgs", str(test_imgs)]
        sfl.main()
        if pub_ids is not None:
            sys.argv = ["split_pretrain.py", "--data_dir", str(src),
                        "--output_dir", str(out), "--num_ID", str(pub_ids),
                        "--min_imgs", str(imgs_per_id),
                        "--max_imgs", str(imgs_per_id)]
            spre.main()
    finally:
        sys.argv = argv
