"""Dataset tooling (L8): Kaggle download helper + raw-dataset organizers.

Parity with reference download_dataset.py (interactive Kaggle CLI
download of Emotions-NLP) and organize_datasets.py (TESS speech,
FER2013 images, Emotions-NLP text -> datasets/{speech,images,text}).
"""
