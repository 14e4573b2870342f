# latex_ocr_tpu pipelines (capability match for the reference makefile:31-53)

# quick-start: 110-sample dataset, build -> train -> evaluate
small: build-small train-small eval-small

build-small:
	python build.py --data=configs/data_small.json --vocab=configs/vocab_small.json

train-small:
	python train.py --data=configs/data_small.json --vocab=configs/vocab_small.json \
		--training=configs/training_small.json --model=configs/model.json --output=results/small/

eval-small:
	python evaluate_txt.py --results=results/small/
	python evaluate_img.py --results=results/small/

# full im2latex-100k pipeline (requires the dataset under data/)
full: build-full train-full eval-full

build-full:
	python build.py --data=configs/data.json --vocab=configs/vocab.json

train-full:
	python train.py --data=configs/data.json --vocab=configs/vocab.json \
		--training=configs/training.json --model=configs/model.json --output=results/full/

eval-full:
	python evaluate_txt.py --results=results/full/
	python evaluate_img.py --results=results/full/

# same full pipeline on the r4 flagship (transformer 2L/8H/256d + label
# smoothing; configs/model.json stays the reference-parity attn-LSTM)
full-flagship: build-full train-full-flagship eval-full-flagship

train-full-flagship:
	python train.py --data=configs/data.json --vocab=configs/vocab.json \
		--training=configs/training.json --model=configs/model_transformer.json \
		--output=results/full_flagship/

eval-full-flagship:
	python evaluate_txt.py --results=results/full_flagship/
	python evaluate_img.py --results=results/full_flagship/

# the r5 headline: the flagship curriculum on the 2-D structural raster
# (REAL im2latex formulas; data/layout.py renders \frac/^/_/\sqrt/arrays
# as stacked TeX boxes — see RESULTS.md "Round 5 additions")
full-2d:
	bash scripts/train_im2latex_2d.sh

test:
	python -m pytest tests/ -q

bench:
	python bench.py

bench-mix:  # epoch-mix throughput over a real dataset's full bucket mix
	python bench.py --mix

.PHONY: full-2d small build-small train-small eval-small full build-full train-full eval-full full-flagship train-full-flagship eval-full-flagship test bench bench-mix
