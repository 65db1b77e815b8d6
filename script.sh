# ----------------- Canonical commands (reference script.sh parity) -----------
# Paths: point --sid_folder / --resources_path / --pretrained_dir /
# --synthetic_folder at your data (the reference hardcoded cluster paths).

# ----------------- Diffusion Training ----------------------

# Train the diffusion model
python train_diffusion.py --use_tb_logger --save_epoch_freq 10 --generation_result noise --name train_diffusion --net_name NoiseDiffNet --beta_schedule sigmoid2 --positional_encoding --trainset SonyTrainDataset --dim 48 --crop_size 512 --with_camera_settings --batch_size 4 --max_iter 500 --save_folder ./logs/noise_synthesis_newstart/weights --sid_folder ./SID

# ----------------- Diffusion Testing ----------------------

# Generate noise data for one camera setting (change --iso / --ratio).
# Reference default is the 1000-step DDPM; add `--sampling_timesteps 100`
# for DDIM or `--sampler dpm --sampling_timesteps 25` for DPM-Solver++ (4x
# faster at comparable quality).
python test_diffusion.py --name ISO800Ratio250 --resume pretrained_ckpts/DiffusionNet_ckpt.pth --generation_result noise --testset NoiseImageGenerationDataset --save_npy --random_seed 0 --beta_schedule sigmoid2 --batch_size 4 --net_name NoiseDiffNet --positional_encoding --dim 48 --crop_size 512 --with_camera_settings --save_folder ./output/generated_data/noise_imgs_SID_DDPM --iso 800 --ratio 250 --sid_folder ./SID

# ----------------- Denoising Training ----------------------

# Train the denoising network with synthetic data (NoiseDiff* = with
# darkshading correction + SNA)
python train_denoising.py --use_tb_logger --loss_l1 --save_epoch_freq 50 --crop_size 256 --sub_darkshading --use_sna --name train_denoising_noisediffstar --trainset SyntheticNoisDiffDenoisingDataset --batch_size 4 --max_iter 500 --save_folder ./logs/denoising_newstart/weights --sid_folder ./SID

# ----------------- Denoising Testing ----------------------

# SID testset, with darkshading correction
python test_denoising.py --resume pretrained_ckpts/NoiseDiffStar_ckpt.pth --correct_darkshading --correct_illum --ratio 100 --visualize_img --save_folder output/denoising/test_darkdiffusionstar_SID --test_dataset SID --sid_folder ./SID

# ELD testset, with darkshading correction
python test_denoising.py --resume pretrained_ckpts/NoiseDiffStar_ckpt.pth --correct_darkshading --correct_illum --ratio 100 --visualize_img --save_folder output/denoising/test_darkdiffusionstar_ELD --test_dataset ELD --eld_folder ./ELD/testset --sid_folder ./SID

# SID testset, without darkshading correction
python test_denoising.py --resume pretrained_ckpts/NoiseDiff_ckpt.pth --correct_illum --ratio 100 --visualize_img --save_folder output/denoising/test_darkdiffusion_SID --test_dataset SID --sid_folder ./SID

# ELD testset, without darkshading correction
python test_denoising.py --resume pretrained_ckpts/NoiseDiff_ckpt.pth --correct_illum --ratio 100 --visualize_img --save_folder output/denoising/test_darkdiffusion_ELD --test_dataset ELD --eld_folder ./ELD/testset --sid_folder ./SID

# ----------------- Extras (this framework) ----------------------

# Noise-realism KLD between real and generated noise
python -m noisediff_tpu.cli.eval_kld --iso 800 --ratio 250 --generated ./output/generated_data/noise_imgs_SID_DDPM/ISO800Ratio250/npy/generated --sid_folder ./SID

# Alternative stage-2 baselines from the reference
# python train_denoising.py --use_tb_logger --loss_l1 --save_epoch_freq 50 --crop_size 256 --name train_denoising_real --trainset RealSonyDenoisingDataset --batch_size 4 --max_iter 500 --save_folder ./logs/denoising_newstart/weights --sid_folder ./SID
# python train_denoising.py --use_tb_logger --loss_l1 --save_epoch_freq 50 --crop_size 256 --name train_denoising_poissongaussian --trainset PossionGaussianDenoisingDataset --batch_size 4 --max_iter 500 --save_folder ./logs/denoising_newstart/weights --sid_folder ./SID
