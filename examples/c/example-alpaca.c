/* Alpaca-format chat REPL over the fastllama_tpu C ABI — the TPU
 * counterpart of the reference's C alpaca example
 * (/root/reference/examples/c/example-alpaca.c): each stdin line is wrapped
 * in the Alpaca instruction/response template, ingested, and answered with
 * "###" as the stop word. Ctrl-C is routed into the library via
 * llama_handle_signal, which stops the in-flight generation at the next
 * token boundary and returns to the prompt (the session stays resumable) —
 * a second Ctrl-C at the prompt exits via EOF handling as usual.
 *
 * Build (after `make -C fastllama_tpu/native c_abi`):
 *   gcc examples/c/example-alpaca.c -Ifastllama_tpu/native \
 *       -Lfastllama_tpu/native -lfastllama_c -o fl_alpaca
 *   LD_LIBRARY_PATH=fastllama_tpu/native PYTHONPATH=. \
 *       ./fl_alpaca path/to/alpaca-q4_0.bin [n_tokens] [temp]
 */
#include <signal.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "fastllama_c.h"

#define MAX_INSTRUCTION 1024

static void on_token(char const* s, int n) {
    fwrite(s, 1, (size_t)n, stdout);
    fflush(stdout);
}

static void on_log_err(char const* fn, int fn_len, char const* msg,
                       int msg_len) {
    fprintf(stderr, "[err %.*s] %.*s", fn_len, fn, msg_len, msg);
}

int main(int argc, char** argv) {
    if (argc < 2) {
        fprintf(stderr, "usage: %s <model> [n_tokens] [temp]\n", argv[0]);
        return 2;
    }
    size_t n_tokens = argc > 2 ? (size_t)atoi(argv[2]) : 300;
    float temp = argc > 3 ? (float)atof(argv[3]) : 0.8f;

    struct llama_model_context_args args =
        llama_create_default_context_args();
    args.n_ctx = 512;
    args.n_keep = 48;
    args.n_batch = 64;
    args.logger.log_err = on_log_err;

    struct llama_model_context* ctx = llama_create_context(args);
    if (!ctx) {
        fprintf(stderr, "context creation failed\n");
        return 1;
    }
    if (!llama_load_model(ctx, argv[1])) {
        fprintf(stderr, "model load failed: %s\n", argv[1]);
        llama_free_context(ctx);
        return 1;
    }

    const char* stops[] = {"###"};
    llama_set_stop_words(ctx, stops, 1);

    /* Ctrl-C stops the current generation cleanly instead of the process. */
    signal(SIGINT, llama_handle_signal);

    static const char prefix[] = "\n\n### Instruction:\n\n";
    static const char suffix[] = "\n\n### Response:\n\n";
    char line[MAX_INSTRUCTION];
    char prompt[sizeof(prefix) + MAX_INSTRUCTION + sizeof(suffix)];

    printf("User: ");
    fflush(stdout);
    while (fgets(line, sizeof(line), stdin)) {
        size_t len = strlen(line);
        while (len && (line[len - 1] == '\n' || line[len - 1] == '\r'))
            line[--len] = '\0';
        if (!len) {
            printf("User: ");
            fflush(stdout);
            continue;
        }
        snprintf(prompt, sizeof(prompt), "%s%s%s", prefix, line, suffix);

        if (!llama_ingest(ctx, prompt)) {
            fprintf(stderr, "ingest failed\n");
            llama_free_context(ctx);
            return 2;
        }
        if (!llama_generate(ctx, on_token, n_tokens, 40.0f, 0.95f, temp,
                            1.0f)) {
            fprintf(stderr, "generate failed\n");
            llama_free_context(ctx);
            return 3;
        }
        printf("\nUser: ");
        fflush(stdout);
    }
    printf("\n");

    llama_free_context(ctx);
    return 0;
}
