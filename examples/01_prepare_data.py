"""Data preparation walkthrough (reference ``tutorials/01_prepare_data.ipynb``).

Reading raw interactions, converting explicit star ratings to implicit
feedback, building ``Interactions``, and splitting stratified-by-user.

Run:  python examples/01_prepare_data.py  (add COLLIE_TPU_SYNTHETIC_MOVIELENS=1 offline)
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import _scale  # noqa: F401  (config-level platform override under smoke CI)

from collie_tpu.cross_validation import stratified_split
from collie_tpu.interactions import Interactions
from collie_tpu.movielens import read_movielens_df
from collie_tpu.utils import convert_to_implicit, remove_users_with_fewer_than_n_interactions


def main():
    df = read_movielens_df(decrement_ids=True, synthetic_fallback=True)
    print(f'raw interactions: {len(df)} rows, '
          f'{df.user_id.nunique()} users x {df.item_id.nunique()} items')

    # explicit 1-5 stars -> implicit "liked" signal (keep >= 4 stars)
    df_implicit = convert_to_implicit(df, min_rating_to_keep=4)
    df_implicit = remove_users_with_fewer_than_n_interactions(df_implicit, 3)
    print(f'implicit interactions: {len(df_implicit)}')

    interactions = Interactions(users=df_implicit['user_id'].values,
                                items=df_implicit['item_id'].values,
                                ratings=df_implicit['rating'].values,
                                allow_missing_ids=True)
    print(interactions)

    train, val, test = stratified_split(interactions, val_p=0.1, test_p=0.1, seed=42)
    print(f'train/val/test: {len(train)}/{len(val)}/{len(test)} '
          '(every user present in every split)')


if __name__ == '__main__':
    main()
