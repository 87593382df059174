/* Perplexity from C — the TPU counterpart of the reference's C perplexity
 * example (/root/reference/examples/c/perplexity.c: load, slice a text
 * file, print model perplexity). Also exercises the all-logits view at the
 * real vocab size through llama_get_logits.
 *
 * Build (after `make -C fastllama_tpu/native c_abi`):
 *   gcc examples/c/perplexity.c -Ifastllama_tpu/native \
 *       -Lfastllama_tpu/native -lfastllama_c -o fl_ppl
 *   LD_LIBRARY_PATH=fastllama_tpu/native PYTHONPATH=. \
 *       ./fl_ppl path/to/model.bin wiki.test.raw 8000
 *
 * Usage: fl_ppl <model> [textfile] [max_chars]
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "fastllama_c.h"

static const char* FALLBACK_TEXT =
    " The quick brown fox jumps over the lazy dog."
    " Perplexity measures how well a language model predicts a sample:"
    " lower is better, and a quantized model should stay close to its"
    " full-precision baseline.";

static char* read_slice(const char* path, size_t max_chars) {
    FILE* f = fopen(path, "rb");
    if (!f) return NULL;
    char* buf = (char*)malloc(max_chars + 1);
    if (!buf) {
        fclose(f);
        return NULL;
    }
    size_t n = fread(buf, 1, max_chars, f);
    fclose(f);
    buf[n] = '\0';
    return buf;
}

int main(int argc, char** argv) {
    if (argc < 2) {
        fprintf(stderr, "usage: %s <model> [textfile] [max_chars]\n",
                argv[0]);
        return 2;
    }
    size_t max_chars = argc > 3 ? (size_t)atoi(argv[3]) : 8000;
    char* text = argc > 2 ? read_slice(argv[2], max_chars) : NULL;
    if (argc > 2 && !text) {
        fprintf(stderr, "cannot read %s\n", argv[2]);
        return 1;
    }

    struct llama_model_context_args args =
        llama_create_default_context_args();
    args.n_ctx = 512;
    args.should_get_all_logits = true; /* perplexity needs every position */

    struct llama_model_context* ctx = llama_create_context(args);
    if (!ctx) {
        fprintf(stderr, "context creation failed\n");
        free(text);
        return 1;
    }
    if (!llama_load_model(ctx, argv[1])) {
        fprintf(stderr, "model load failed: %s\n", argv[1]);
        llama_free_context(ctx);
        free(text);
        return 1;
    }

    float ppl = llama_perplexity(ctx, text ? text : FALLBACK_TEXT);
    if (ppl < 0.0f) {
        fprintf(stderr, "perplexity evaluation failed\n");
        llama_free_context(ctx);
        free(text);
        return 1;
    }
    printf("perplexity: %.4f\n", ppl);

    /* The all-logits view: [n_positions * n_vocab] floats owned by the
     * context. Report the arg-max of the final position as a sanity line. */
    struct llama_array_view_f logits = llama_get_logits(ctx);
    if (logits.size > 0) {
        size_t n_vocab = (size_t)llama_get_n_vocab(ctx);
        size_t best = 0, i;
        for (i = 1; i < logits.size; ++i)
            if (logits.data[i] > logits.data[best]) best = i;
        printf("logit view: %zu values, argmax id %zu (%.3f)\n",
               logits.size, n_vocab ? best % n_vocab : best,
               logits.data[best]);
    }

    llama_free_context(ctx);
    free(text);
    return 0;
}
