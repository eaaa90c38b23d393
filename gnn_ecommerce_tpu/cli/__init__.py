"""CLI entry points: preprocess / train / infer / serve.

Reference equivalents: ``python src/train_lightgcn.py -e E -g G``
(``src/train_lightgcn.py:178-189``), ``python src/inference_lightgcn.py -g G
-c CKPT`` (``src/inference_lightgcn.py:147-155``), the TorchServe shell
scripts (``torchserve/*.sh``), and the preprocessing notebook
(``notebooks/1.data_preprocessing.ipynb``). Run as modules:

    python -m gnn_ecommerce_tpu.cli.preprocess --events events.csv -o edges.csv
    python -m gnn_ecommerce_tpu.cli.train --synthetic -e 5
    python -m gnn_ecommerce_tpu.cli.infer -d DATA_DIR -c CKPT_DIR
    python -m gnn_ecommerce_tpu.cli.serve -d DATA_DIR -c CKPT_DIR -p 8080
"""
