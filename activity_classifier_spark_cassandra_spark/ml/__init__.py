"""spark.ml layer: train / evaluate / persist / serve (reference
operators ML1-ML3, ML6-ML7, S5, S6, M1, M2 — SURVEY.md §2.10)."""

from .models import (  # noqa: F401
    EVENTS_FEATURE_COLS,
    build_pipeline,
    feature_frame,
    load_model,
    predict_point,
    q_ml_predict_counts,
    q_ml_serve,
    q_ml_train_eval,
    save_model,
    train_eval_all,
    train_test_split,
)
