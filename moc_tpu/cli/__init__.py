"""moc_tpu.cli — command-line entry points mirroring the reference scripts.

  * ``python -m moc_tpu.cli.main_moc``  — the MOC train/eval/summary CLI
    (``/root/reference/main_moc.py`` flags);
  * ``python -m moc_tpu.cli.train_mil`` — baseline MIL fold training
    (the driver the reference keeps in ``utils/core_utils.py``);
  * ``python -m moc_tpu.cli.sweep``     — fused multi-fold episode sweeps;
  * ``python -m moc_tpu.cli.predict``   — standalone checkpoint serving;
  * ``python -m moc_tpu.cli.lora_finetune`` — (MoE-)LoRA tower fine-tuning;
  * ``python -m moc_tpu.cli.extract_features`` — raw patch pixels → bag
    features (the step the reference outsources to an external CLAM fork).
"""
